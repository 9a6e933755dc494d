package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the harness's fail-loud contracts (r6 post-mortem: 18 broken
  * queries produced plausible-looking bench timings and silently vanished
  * from the correctness report). A deliberately-broken query must surface
  * in BOTH artifacts. */
class BenchVerifyLoudSpec extends SparkSuite {
  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => sys.error("deliberately broken query")
  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")

  test("Bench.timeQueries marks a failing query with rows = -1, never a silent timing") {
    val r = Bench.timeQueries(spark, sfDir, Seq("good" -> ok, "bad" -> boom))
      .map(t => t._1 -> t._3).toMap
    assert(r("good") == 3L)
    assert(r("bad") == -1L)
  }

  test("both mains reject an empty or typo'd query filter loudly") {
    // a typo must not silently vanish from the report (_failed.json=[]),
    // and an empty filter must not bench nothing as a value=0 success
    intercept[IllegalArgumentException](Verify.validateFilter(Set.empty))
    intercept[IllegalArgumentException](Verify.validateFilter(Set("q01_typo")))
    intercept[IllegalArgumentException](Bench.validateFilter(Set.empty))
    intercept[IllegalArgumentException](Bench.validateFilter(Set("q01_typo")))
    Verify.validateFilter(Set("q01_pricing_summary")) // known names pass
    Bench.validateFilter(Set("q01_pricing_summary"))
  }

  test("Verify.dumpQueries writes a driver-visible error parquet in place of a failing query") {
    val out = tmpDir("verify-loud")
    val failed = Verify.dumpQueries(spark, sfDir, out, Seq("good" -> ok, "bad" -> boom))
    assert(failed == Seq("bad"))
    // the error parquet exists where the result would be, so the driver's
    // compare records an explicit red row instead of omitting the query
    val err = spark.read.parquet(s"$out/bad")
    assert(err.columns.toSeq == Seq("verify_error"))
    assert(err.collect().head.getString(0).contains("deliberately broken"))
    assert(spark.read.parquet(s"$out/good").count() == 3)
  }
}
