package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Kaplan-Meier survival curve semantics ([[Survival.curve]]). */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  // group g: 4 users with lifetimes 0, 1, 1, 3 (periods of activity)
  private lazy val events = Seq(
    ("g", 1L, 10L),                             // u1: t=0
    ("g", 2L, 10L), ("g", 2L, 11L),             // u2: t=1
    ("g", 3L, 12L), ("g", 3L, 13L),             // u3: t=1
    ("g", 4L, 10L), ("g", 4L, 12L), ("g", 4L, 13L) // u4: t=3
  ).toDF("grp", "user", "p")

  test("hazards chain into the product-limit estimator; last t hits zero") {
    val got = Survival.curve(events, "grp", "user", col("p"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // t=0: 4 at risk, 1 churns → S = 3/4; t=1: 3 at risk, 2 churn →
    // S = 3/4 × 1/3 = 1/4; t=3: last at risk churns → S = 0
    assert(got.map(r => (r._2, r._3, r._4)) == Seq((0L, 4L, 1L), (1L, 3L, 2L), (3L, 1L, 1L)))
    assert(math.abs(got(0)._5 - 0.75) < 1e-6)
    assert(math.abs(got(1)._5 - 0.25) < 1e-6)
    assert(got(2)._5 == 0.0)
  }

  test("groups are independent; null entities and periods drop") {
    val mixed = events.union(Seq(
      ("h", 9L, 5L), ("h", 9L, 6L),              // lone user, t=1
      ("h", 0L, 5L), ("g", 5L, 0L)               // null user / null period
    ).map { case (g, u, p) =>
      (g, if (u == 0) None else Some(u), if (p == 0) None else Some(p))
    }.toDF("grp", "user", "p"))
    val h = Survival.curve(mixed, "grp", "user", col("p"))
      .where(col("g") === "h")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(h == Seq(("h", 1L, 1L, 1L, 0.0))) // one user at risk, churns at 1
    val g = Survival.curve(mixed, "grp", "user", col("p"))
      .where(col("g") === "g").count()
    assert(g == 3) // the null rows changed nothing
  }
}
