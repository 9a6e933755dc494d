package graft.devtools

import java.nio.file.Paths

/** Helper main for CrossProcessLockSpec's forked-JVM tests — a SECOND
  * PROCESS exercising graft.core.Locks against the parent's files. No
  * Spark session: the lock layer is plain NIO, so the fork stays cheap
  * and the test pins exactly the OS-lock semantics.
  *
  * Modes:
  *  - `hold <lockFile> <millis>`: take the blocking build lock, print
  *    HELD, keep it for `millis`, release, print RELEASED.
  *  - `own <lockFile> <millis>`: attempt the process-lifetime ownership
  *    claim, print OWNED or BLOCKED; if owned, stay alive `millis` so the
  *    parent can observe the contention.
  */
object LockProbe {
  def main(args: Array[String]): Unit = args(0) match {
    case "hold" =>
      graft.core.Locks.withFileLock(Paths.get(args(1))) {
        // print the RELEASE DEADLINE (epoch ms): we hold at least until
        // then, so the parent can assert it acquired at/after this
        // instant — an ordering check immune to fork/pipe jitter that a
        // parent-side elapsed-time window is not
        val deadline = System.currentTimeMillis() + args(2).toLong
        println(s"HELD $deadline"); System.out.flush()
        while (System.currentTimeMillis() < deadline) Thread.sleep(25)
      }
      println("RELEASED"); System.out.flush()
    case "own" =>
      val ok = graft.core.Locks.tryOwnProcessWide(Paths.get(args(1)))
      println(if (ok) "OWNED" else "BLOCKED"); System.out.flush()
      if (ok) Thread.sleep(args(2).toLong)
    case other => sys.error(s"unknown mode $other")
  }
}
