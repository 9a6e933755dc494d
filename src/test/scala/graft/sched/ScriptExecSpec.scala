package graft.sched

import org.scalatest.funsuite.AnyFunSuite

class ScriptExecSpec extends AnyFunSuite {

  private def writeScript(body: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("scripts")
    val p = dir.resolve("job.py")
    java.nio.file.Files.writeString(p, body)
    p.toString
  }

  test("successful script returns stdout (S8)") {
    val r = Scheduler.runPython(writeScript("print('hello from job')\n"))
    assert(r.isRight && r.exists(_.contains("hello from job")))
  }

  test("failing script returns stderr and exit code") {
    val r = Scheduler.runPython(writeScript(
      "import sys\nprint('partial')\nsys.stderr.write('boom\\n')\nsys.exit(3)\n"))
    assert(r.isLeft)
    assert(r.swap.exists(e => e.contains("exit=3") && e.contains("boom")))
  }

  test("chatty script (>pipe-buffer stdout) completes instead of deadlocking into a false timeout") {
    // 4 MiB of stdout — far past the ~64 KiB pipe buffer. Pre-fix the child
    // blocked on write while the parent sat in waitFor, burned the 300 s
    // budget, and a HEALTHY run was logged as a timeout.
    val r = Scheduler.runPython(writeScript(
      "import sys\n" +
      "for _ in range(4096):\n" +
      "    sys.stdout.write('x' * 1024)\n" +
      "print('\\nDONE-MARKER')\n"))
    assert(r.isRight, s"chatty script failed: ${r.swap.getOrElse("")}")
    assert(r.exists(_.contains("DONE-MARKER")), "full stdout captured")
  }

  test("missing script is an error, not an exception") {
    assert(Scheduler.runPython("/nonexistent/job.py").isLeft)
  }

  test("script runs with cwd = script dir (reference PYTHONPATH semantics)") {
    val r = Scheduler.runPython(writeScript(
      "import os\nprint(os.path.basename(os.getcwd()))\n"))
    assert(r.isRight) // cwd is the temp scripts dir, not the caller's cwd
  }
}
