package graft.operators

import graft.SparkSpec

/** Skyline semantics: dominance filtering, tie handling, bucket-boundary
  * correctness (a dominator in a far-away bucket must still kill). */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: Seq[(Double, Double)], width: Double = 10.0) =
    Skyline.skyline2d(rows.toDF("x", "y"), "x", "y", width)
      .orderBy("x").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq

  test("keeps exactly the non-dominated points") {
    val pts = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 8.0), // (3,8) dominated by (2,7)
      (4.0, 4.0), (9.0, 3.0), (10.0, 5.0))            // (10,5) dominated by (9,3)
    assert(sky(pts) == Seq((1.0, 9.0), (2.0, 7.0), (4.0, 4.0), (9.0, 3.0)))
  }

  test("same-x points reduce to the min y; equal y at larger x is dominated") {
    val pts = Seq((5.0, 2.0), (5.0, 8.0), (7.0, 2.0)) // (7,2): y ties the running min
    assert(sky(pts) == Seq((5.0, 2.0)))
  }

  test("a dominator buckets away still dominates (cross-bucket filter)") {
    // width 10: x=1 is bucket 0, x=95 bucket 9 — y=5 > 3 must die anyway
    val pts = Seq((1.0, 3.0), (95.0, 5.0))
    assert(sky(pts) == Seq((1.0, 3.0)))
  }

  test("bucket width does not change the answer") {
    val pts = Seq((1.0, 50.0), (12.0, 40.0), (13.0, 45.0), (25.0, 10.0),
      (26.0, 9.0), (90.0, 8.0), (91.0, 60.0))
    val expect = sky(pts, width = 10.0)
    assert(sky(pts, width = 3.0) == expect)
    assert(sky(pts, width = 1000.0) == expect)
  }

  test("nulls are excluded; duplicates collapse to one row") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (1.0, 2.0), (null, 0.0), (0.5, null))
      .toDF("x", "y")
    val out = Skyline.skyline2d(df, "x", "y", 10.0).collect()
    assert(out.map(r => (r.getDouble(0), r.getDouble(1))).toSeq == Seq((1.0, 2.0)))
  }
}
