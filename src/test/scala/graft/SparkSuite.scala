package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {

  /** Suites run sequentially in the forked test JVM; draining EVERY scope
    * at suite end means a test that pins tracked frames and forgets its
    * own releaseAll cannot leak them into a later suite's global-zero
    * assertion (AdminApiSpec's request-drain test counts ALL scopes — a
    * 2-suite `testOnly` combo exposed exactly that leak). */
  override protected def afterAll(): Unit = {
    graft.core.Mat.releaseAllScopes()
    super.afterAll()
  }
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // session constant (see GraftSession): suites share one session and
    // run in parallel — a scoped restore of this conf races Tables.load
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  /** Larger driver-generated corpora, for tests that need scale contrast
    * (growth-rate assertions) or more rows than sf0.001 provides — one
    * definition instead of per-spec hardcoded paths. */
  val sf001Dir = "/root/testdata/sf0.01"
  val sf01Dir = "/root/testdata/sf0.1"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
