package graft

/** Contract guards for the driver-facing surface. */
class SparkEntrySpec extends SparkSuite {

  test("every oracle key has a matching query (a dangling oracle would zero the gate)") {
    val dangling = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("query names follow the qNN_ naming scheme and are unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    assert(names.distinct.size == names.size)
  }

  test("entry() flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL contains no tab/CR characters that would stress JSON escaping") {
    // Verify.q escapes them correctly, but keeping the SQL clean keeps the
    // driver-side diff readable
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$k has tab/CR")
    }
  }
}
