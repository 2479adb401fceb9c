package graft.operators

import graft.SparkSpec

/** k-anonymity / l-diversity audit: violation selection, null QI
  * groups, passing groups absent. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("flags small groups and low-diversity groups, skips passing ones") {
    val df = Seq(
      // group (a,x): 3 rows, 3 distinct sensitive → passes both
      ("a", "x", 1.0), ("a", "x", 2.0), ("a", "x", 3.0),
      // group (a,y): 1 row → k fails (and l with l=2)
      ("a", "y", 9.0),
      // group (b,x): 3 rows but ONE sensitive value → l fails only
      ("b", "x", 7.0), ("b", "x", 7.0), ("b", "x", 7.0))
      .toDF("qi1", "qi2", "s")
    val out = Privacy.kAnonymityAudit(df, Seq("qi1", "qi2"), "s", k = 2, l = 2)
      .orderBy("qi1", "qi2").collect()
    val got = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("a", "y", 1L, 1L, false, false),
      ("b", "x", 3L, 1L, true, false)))
  }

  test("null quasi-identifier values form their own auditable group") {
    val df = Seq[(java.lang.Long, Double)]((null, 1.0), (1L, 2.0), (1L, 3.0))
      .toDF("qi", "s")
    val out = Privacy.kAnonymityAudit(df, Seq("qi"), "s", k = 2, l = 1)
      .collect()
    assert(out.length == 1 && out.head.isNullAt(0) &&
      out.head.getLong(1) == 1L)
  }
}
