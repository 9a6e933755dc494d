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

  test("missing script is an error, not an exception") {
    assert(Scheduler.runPython("/nonexistent/job.py").isLeft)
  }

  test("script runs with cwd = script dir (reference PYTHONPATH semantics)") {
    val r = Scheduler.runPython(writeScript(
      "import os\nprint(os.path.basename(os.getcwd()))\n"))
    assert(r.isRight) // cwd is the temp scripts dir, not the caller's cwd
  }
}
