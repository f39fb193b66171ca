package graft

/** Smoke: every declared query runs on sf0.001 and returns rows, and every
  * oracle-bearing query has matching column names with its SQL (the driver's
  * compare sorts columns by name before hashing — a name mismatch fails even
  * when values match).
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
