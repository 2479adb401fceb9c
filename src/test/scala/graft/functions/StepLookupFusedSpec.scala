package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Calibration

/** StepFloorLookup — the fused codegen'd isotonic APPLY must be
  * value-identical to the HOF twin
  * `element_at(rates, greatest(size(filter(ths, t -> t <= s)), 1))` on
  * every edge the twin defines (the QuantizeFusedSpec discipline: the
  * HOF form stays in-tree ONLY as this spec's independent witness). */
class StepLookupFusedSpec extends SparkSpec {
  import spark.implicits._

  private val fit = Seq((0.1, 0.2), (0.3, 0.25), (0.55, 0.4), (0.7, 0.6))

  test("value parity with the HOF twin on random scores") {
    val rnd = new scala.util.Random(42)
    val scores = (0 until 4000).map(i => (i.toLong, rnd.nextDouble() * 2 - 0.5))
    val mismatches = scores.toDF("id", "s").repartition(7)
      .select(Calibration.calibrateColumn(col("s"), fit).as("fused"),
        Calibration.calibrateColumnHof(col("s"), fit).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("edge parity: exact hits, clamped ends, infinities, NaN, null") {
    val edges = Seq(0.1, 0.3, 0.55, 0.7, // exact threshold hits
      0.0999999, 0.5499999,              // just below a threshold
      -1e300, Double.NegativeInfinity,   // below range → first rate
      1e300, Double.PositiveInfinity,    // above range → last rate
      Double.NaN)                        // Spark orders NaN above all → last
    val rows = edges.map(Option(_)) :+ Option.empty[Double]
    val out = rows.toDF("s")
      .select(col("s"), Calibration.calibrateColumn(col("s"), fit).as("fused"),
        Calibration.calibrateColumnHof(col("s"), fit).as("hof"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"null score must stay null: $r")
      } else {
        assert(!r.isNullAt(1) && !r.isNullAt(2), s"non-null score nulled: $r")
        assert(r.getDouble(1) == r.getDouble(2), s"fused != hof: $r")
      }
    }
    // pin the clamp/NaN values explicitly, not just twin agreement
    val byScore = out.filterNot(_.isNullAt(0))
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(byScore(Double.NegativeInfinity) == 0.2)
    assert(byScore(Double.PositiveInfinity) == 0.6)
    assert(byScore.find(_._1.isNaN).get._2 == 0.6)
  }

  test("the fused apply stays inside whole-stage codegen (no HOF fallback)") {
    val df = spark.range(100).select(
      (col("id") / 100.0).as("s"))
      .select(Calibration.calibrateColumn(col("s"), fit).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"),
      s"fused apply must not plan a higher-order function:\n$plan")
    // executedPlan.toString marks whole-stage-codegen'd operators with
    // a `*(stageId)` prefix — the Project carrying the lookup must have it
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("step_floor_lookup")),
      s"fused apply fell out of whole-stage codegen:\n$plan")
  }

  test("single-bin fit maps every score to its rate") {
    val one = Seq((0.5, 0.7))
    val out = Seq(-1.0, 0.5, 9.9).toDF("s")
      .select(Calibration.calibrateColumn(col("s"), one).as("c"),
        Calibration.calibrateColumnHof(col("s"), one).as("h"))
      .as[(Double, Double)].collect()
    assert(out.forall(t => t._1 == 0.7 && t._2 == 0.7))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.DoubleType
    val expr = StepFloorLookup(BoundReference(0, DoubleType, nullable = true),
      fit.map(_._1).toArray, fit.map(_._2).toArray)
    assert(expr.eval(InternalRow(0.31)) == 0.25)
    assert(expr.eval(InternalRow(0.05)) == 0.2)
    assert(expr.eval(InternalRow(Double.NaN)) == 0.6)
  }

  test("constructor validates the fit arrays") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.DoubleType
    val b = BoundReference(0, DoubleType, nullable = true)
    intercept[IllegalArgumentException](
      StepFloorLookup(b, Array.empty[Double], Array.empty[Double]))
    intercept[IllegalArgumentException](
      StepFloorLookup(b, Array(0.3, 0.1), Array(0.1, 0.2)))
    intercept[IllegalArgumentException](
      StepFloorLookup(b, Array(0.1, Double.NaN), Array(0.1, 0.2)))
    intercept[IllegalArgumentException](
      StepFloorLookup(b, Array(0.1), Array(0.1, 0.2)))
  }
}
