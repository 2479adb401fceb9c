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
}
