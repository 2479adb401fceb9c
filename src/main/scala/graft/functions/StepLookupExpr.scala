package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Step-function floor lookup — the serving-side APPLY of a fitted
  * monotone map (isotonic calibration, piecewise-constant rate tables):
  * `rate of the LAST threshold ≤ score`, clamping below-range scores to
  * the first rate (standard isotonic extrapolation; above-range scores
  * take the last rate by the same floor rule).
  *
  * Why a native expression: the composable form —
  * `element_at(rates, greatest(size(filter(ths, t -> t <= score)), 1))`
  * — rides the `filter` higher-order function, which is CodegenFallback
  * in Spark: the WHOLE enclosing projection drops to interpreted
  * per-element expression dispatch (the round-8 quantizer finding:
  * ~30× at the 50M probe rung, invisible at gate SF). A serving path
  * that maps billions of scores through a ≤1024-bin fit must stay
  * inside whole-stage codegen; this expression compiles to one static
  * binary-search call (O(log bins) vs the HOF's O(bins), and fused).
  *
  * Parity contract with the HOF twin, value for value (spec-gated in
  * CalibrationSpec):
  *   - null score → null;
  *   - NaN score → the LAST rate (Spark SQL comparison semantics order
  *     NaN above every double, so every threshold passes `t <= score` —
  *     mirrored explicitly here because Java's `<=` says false);
  *   - −Inf (or anything below ths(0)) → the FIRST rate (floor index
  *     clamps to 0); +Inf → the last rate;
  *   - exact threshold hits take that threshold's rate (`<=`, not `<`).
  *
  * The fit rides as codegen reference objects (like [[NearestCentroid]]),
  * so re-planning with a refreshed fit reuses the compiled class. */
object StepFloorLookup {
  /** Binary search: rate of the last `ths(i) <= score`, clamped to
    * `rates(0)` below range. `ths` must be strictly ascending (checked
    * at construction, not per call). */
  def lookup(score: Double, ths: Array[Double], rates: Array[Double]): Double = {
    if (java.lang.Double.isNaN(score)) return rates(rates.length - 1)
    var lo = 0; var hi = ths.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ths(mid) <= score) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    rates(if (ans < 0) 0 else ans)
  }

  def column(score: Column, ths: Array[Double], rates: Array[Double]): Column =
    ColumnBridge.column(
      StepFloorLookup(ColumnBridge.expression(score), ths, rates))
}

case class StepFloorLookup(child: Expression, ths: Array[Double],
    rates: Array[Double]) extends UnaryExpression {
  require(ths.nonEmpty && ths.length == rates.length,
    s"step_floor_lookup needs matching non-empty threshold/rate arrays, " +
      s"got ${ths.length}/${rates.length}")
  require(ths.forall(t => !t.isNaN && !t.isInfinite),
    "step_floor_lookup thresholds must be finite")
  require((1 until ths.length).forall(i => ths(i - 1) < ths(i)),
    "step_floor_lookup thresholds must be strictly ascending")

  override def prettyName: String = "step_floor_lookup"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a double score, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    StepFloorLookup.lookup(input.asInstanceOf[Double], ths, rates)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thsRef = ctx.addReferenceObj("ths", ths, "double[]")
    val ratesRef = ctx.addReferenceObj("rates", rates, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StepFloorLookup.lookup($c, $thsRef, $ratesRef)")
  }

  // value-based equality over the Array params (case-class equals is
  // reference-based on arrays, defeating expression dedup — see JlProject)
  override def equals(other: Any): Boolean = other match {
    case s: StepFloorLookup => child == s.child &&
      java.util.Arrays.equals(ths, s.ths) &&
      java.util.Arrays.equals(rates, s.rates)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.hashCode(ths)),
    Integer.valueOf(java.util.Arrays.hashCode(rates)))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
