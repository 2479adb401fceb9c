package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-group scaling: z-score/min-max/winsorize semantics, degenerate
  * groups, reserved-name guards. */
class FeatureScalingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
    ("b", 10.0), ("b", 10.0), // constant group
    ("c", 7.0)                // singleton
  ).toDF("g", "x")

  test("groupZScore standardizes within the group; degenerate groups are null") {
    val out = FeatureScaling.groupZScore(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    // group a: mean 2.5, sample sd = sqrt(5/3)
    val sd = math.sqrt(5.0 / 3.0)
    def z(x: Double) = BigDecimal((x - 2.5) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3.get) ==
      Seq(z(1.0), z(2.0), z(3.0), z(4.0)))
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty)) // zero variance
    assert(out.filter(_._1 == "c").forall(_._3.isEmpty)) // n = 1
  }

  test("groupMinMax maps the group onto [0,1]; degenerate groups are null") {
    val out = FeatureScaling.groupMinMax(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3.get) ==
      Seq(0.0, 0.333333, 0.666667, 1.0))
    assert(out.filter(_._1 != "a").forall(_._3.isEmpty))
  }

  test("winsorize clips into the group's percentile band") {
    val out = FeatureScaling.winsorize(df, "g", "x", 0.25, 0.75).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // group a: p25 of {1,2,3,4} = 1.75 (linear interp), p75 = 3.25
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3) ==
      Seq(1.75, 2.0, 3.0, 3.25))
    // constant and singleton groups: band collapses to the value itself
    assert(out.filter(_._1 == "b").map(_._3) == Seq(10.0, 10.0))
    assert(out.filter(_._1 == "c").map(_._3) == Seq(7.0))
  }

  test("reserved internal names are rejected") {
    val clashing = df.withColumn("__n", lit(1))
    assertThrows[IllegalArgumentException] {
      FeatureScaling.groupZScore(clashing, "g", "x")
    }
    assertThrows[IllegalArgumentException] {
      FeatureScaling.winsorize(df.withColumn("__lo", lit(1)), "g", "x", 0.1, 0.9)
    }
  }

  test("scaleAll equals the chained single ops, column for column") {
    val fused = FeatureScaling.scaleAll(df, "g", "x",
        zOut = "z", mmOut = "mm", clipOut = "cl", pLo = 0.25, pHi = 0.75)
      .select("g", "x", "z", "mm", "cl")
    val chained = FeatureScaling.winsorize(
        FeatureScaling.groupMinMax(
          FeatureScaling.groupZScore(df, "g", "x", "z"),
          "g", "x", "mm"),
        "g", "x", 0.25, 0.75, "cl")
      .select("g", "x", "z", "mm", "cl")
    assert(fused.exceptAll(chained).isEmpty && chained.exceptAll(fused).isEmpty)
    // single stats pass: exactly one aggregate over the input in the plan
    val aggs = fused.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one fused stats aggregate, got ${aggs.size}")
  }

  // ───────────────────── quantileNormalize ─────────────────────

  test("quantile normalization forces every group onto the rank means") {
    import spark.implicits._
    // two equal-size groups: rank means are (avg of the r-th smallest)
    val rows = Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 6.0),
      ("b", 4L, 10.0), ("b", 5L, 20.0), ("b", 6L, 30.0))
    val out = FeatureScaling.quantileNormalize(
        rows.toDF("g", "id", "v"), "g", "v", "id")
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("qnorm")).toMap
    // rank refs: (2+10)/2=6, (4+20)/2=12, (6+30)/2=18
    assert(out(1L) == 6.0 && out(2L) == 12.0 && out(3L) == 18.0)
    assert(out(4L) == 6.0 && out(5L) == 12.0 && out(6L) == 18.0)
  }

  test("unequal group sizes: long ranks average over present groups only") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("b", 3L, 5.0))
    val out = FeatureScaling.quantileNormalize(
        rows.toDF("g", "id", "v"), "g", "v", "id")
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("qnorm")).toMap
    assert(out(1L) == 3.0 && out(3L) == 3.0) // rank 1: (1+5)/2
    assert(out(2L) == 3.0)                   // rank 2: a alone
  }

  // ───────────────────── piecewiseLinear ─────────────────────

  test("piecewiseLinear interpolates between knots and clamps the edges") {
    import spark.implicits._
    val df = Seq[java.lang.Double](Double.box(-5.0), Double.box(0.0),
      Double.box(5.0), Double.box(10.0), Double.box(15.0),
      Double.box(25.0), null).toDF("v")
    // knots at 0, 10, 20 → ys 0.0, 1.0, 0.5
    val out = FeatureScaling.piecewiseLinear(df, "v", x0 = 0.0, step = 10.0,
        ys = Seq(0.0, 1.0, 0.5))
      .collect().map(r => Option(r.getAs[java.lang.Double]("calibrated"))
        .map(_.doubleValue)).toSeq
    assert(out == Seq(Some(0.0), Some(0.0), Some(0.5), Some(1.0),
      Some(0.75), Some(0.5), None))
  }
}
