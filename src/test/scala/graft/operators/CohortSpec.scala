package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cohort retention matrix semantics ([[Cohort.retention]]). */
class CohortSpec extends SparkSpec {
  import spark.implicits._

  // (user, period): u1 → {10,11,13}, u2 → {10,11}, u3 → {11,13,13 dup},
  // u4 → {10}; null user and null period rows identify no cohort
  private lazy val events = Seq(
    (Some("u1"), Some(10L)), (Some("u1"), Some(11L)), (Some("u1"), Some(13L)),
    (Some("u2"), Some(10L)), (Some("u2"), Some(11L)),
    (Some("u3"), Some(11L)), (Some("u3"), Some(13L)), (Some("u3"), Some(13L)),
    (Some("u4"), Some(10L)),
    (None, Some(10L)), (Some("u5"), None)
  ).toDF("user_id", "p")

  test("retention counts distinct entities per (cohort, offset) with rates") {
    val m = Cohort.retention(events, "user_id", col("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // cohort 10: u1,u2,u4 enter; u1,u2 return at +1; u1 at +3
    assert(m((10L, 0L)) == (3L, 1.0))
    assert(m((10L, 1L)) == (2L, 0.666667))
    assert(m((10L, 3L)) == (1L, 0.333333))
    // cohort 11: u3 only; its duplicate period-13 events collapse
    assert(m((11L, 0L)) == (1L, 1.0))
    assert(m((11L, 2L)) == (1L, 1.0))
    assert(m.size == 5) // null user / null period rows contributed nothing
  }

  test("retention plans without a countDistinct Expand") {
    val plan = Cohort.retention(events, "user_id", col("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "distinct users must come from the collect_set dedup, not an Expand")
  }

  // ───────────────────── touchAttribution ─────────────────────

  test("conversions credit the first and last preceding touch") {
    // user 1: ad → email → purchase(10) → search → purchase(5)
    // user 2: purchase(99) with no preceding touch → dropped
    val ev = Seq(
      (1L, 1L, 10L, "ad", 0.0), (1L, 2L, 20L, "email", 0.0),
      (1L, 3L, 30L, "purchase", 10.0), (1L, 4L, 40L, "search", 0.0),
      (1L, 5L, 50L, "purchase", 5.0),
      (2L, 6L, 10L, "purchase", 99.0)
    ).toDF("u", "id", "ts", "t", "v")
    val got = Cohort.touchAttribution(ev, "u", "ts", "id", "t", "v", "purchase")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // purchase 1: first=ad, last=email; purchase 2: first=ad, last=search
    assert(got == Map(
      ("ad", "email") -> ((1L, 10.0)),
      ("ad", "search") -> ((1L, 5.0))))
  }

  test("a purchase between touches is transparent to later attributions") {
    // the earlier purchase must not become a 'touch' for the later one
    val ev = Seq(
      (1L, 1L, 10L, "ad", 0.0), (1L, 2L, 20L, "purchase", 1.0),
      (1L, 3L, 30L, "purchase", 2.0)
    ).toDF("u", "id", "ts", "t", "v")
    val got = Cohort.touchAttribution(ev, "u", "ts", "id", "t", "v", "purchase")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("ad", "ad", 2L, 3.0)))
  }

  test("activeUsers: exact DAU and trailing-window distinct counts") {
    import org.apache.spark.sql.functions.col
    // day 0: users 1,2; day 1: user 1 (twice); day 3: user 3
    val ev = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 1L), (3L, 3L))
      .toDF("d", "u")
    val got = Cohort.activeUsers(ev, "u", col("d"), window = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // day 0: dau 2, win{day0}∪{} = {1,2} → 2
    // day 1: dau 1, win{0,1} = {1,2} → 2
    // day 3: dau 1, win{2,3} = {3} → 1 (day 2 inactive: no row at all)
    assert(got.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 2L), (3L, 1L, 1L)))
  }
}
