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
        println("HELD"); System.out.flush()
        Thread.sleep(args(2).toLong)
      }
      println("RELEASED"); System.out.flush()
    case "own" =>
      val ok = graft.core.Locks.tryOwnProcessWide(Paths.get(args(1)))
      println(if (ok) "OWNED" else "BLOCKED"); System.out.flush()
      if (ok) Thread.sleep(args(2).toLong)
    case other => sys.error(s"unknown mode $other")
  }
}
