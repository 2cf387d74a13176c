package graft

/** The driver contract itself: entry() must return rows, every queries()
  * key must run at sf0.001, and every oracle key must have a query.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }

  test("every gate query executes at sf0.001 with at least one column") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name produced no columns")
      // force execution, not just analysis: runtime failures (UDF
      // exceptions, bad data) must fail here, not in the driver gate
      df.limit(1).collect()
    }
  }
}
