package graft.operators

import graft.SparkSpec

/** SCD Type-2 interval semantics ([[Scd.scd2]]). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  // key k1: gold(v1) → gold(v2, re-stated) → silver(v3) → gold(v5)
  // key k2: null tier(v1) → null tier(v2, re-stated) → bronze(v4)
  private lazy val log = Seq(
    ("k1", 1L, Some("gold")), ("k1", 2L, Some("gold")),
    ("k1", 3L, Some("silver")), ("k1", 5L, Some("gold")),
    ("k2", 1L, None), ("k2", 2L, None), ("k2", 4L, Some("bronze"))
  ).toDF("k", "v", "tier")

  test("unchanged re-statements collapse; intervals chain exactly") {
    val got = Scd.scd2(log, Seq("k"), "v", Seq("tier"))
      .as[(String, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      ("k1", Some("gold"), 1L, Some(3L), false),
      ("k1", Some("silver"), 3L, Some(5L), false),
      ("k1", Some("gold"), 5L, None, true),
      ("k2", None, 1L, Some(4L), false),      // null attrs compare as values
      ("k2", Some("bronze"), 4L, None, true)))
  }

  test("exactly one current row per key; intervals never overlap") {
    val rows = Scd.scd2(log, Seq("k"), "v", Seq("tier"))
      .as[(String, Option[String], Long, Option[Long], Boolean)].collect()
    val byKey = rows.groupBy(_._1)
    byKey.values.foreach { ivs =>
      assert(ivs.count(_._5) == 1)
      val sorted = ivs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3)) // valid_to = next from
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("reserved output names in the input are rejected") {
    val clash = Seq(("k", 1L, "x", true)).toDF("k", "v", "tier", "is_current")
    val e = intercept[IllegalArgumentException] {
      Scd.scd2(clash, Seq("k"), "v", Seq("tier"))
    }
    assert(e.getMessage.contains("is_current"))
  }
}
