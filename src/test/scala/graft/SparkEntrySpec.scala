package graft

/** Driver-contract consistency: a typo'd oracle key would silently drop a
  * correctness-gate entry, and duplicate output columns would break the
  * driver's column-sorted hashing. */
class SparkEntrySpec extends SparkSpec {

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    qs.foreach(k => assert(k.matches("q_[a-z0-9_]+"), s"bad key: $k"))
  }

  test("flagship entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query builds an analyzable plan with unique column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns: $cols")
      df.queryExecution.analyzed // forces analysis; throws on unresolved plans
    }
  }
}
