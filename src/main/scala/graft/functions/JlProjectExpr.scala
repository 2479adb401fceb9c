package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused Johnson–Lindenstrauss ±1 projection — one pass per row
  * producing all `outDim` components, replacing `outDim` parallel
  * `zip_with` + `aggregate` higher-order chains (CodegenFallback: the
  * whole projection dropped to interpreted eval — the round-8/9 defect
  * class, measured 15-30× on sibling numeric paths).
  *
  * Parity contract with the HOF twin
  * (`Projection.randomProjectHof`, spec-gated in JlProjectFusedSpec),
  * component for component:
  *   - each product x_i·s_ij rounds into a scale-9 decimal EXACTLY like
  *     Spark's double→DECIMAL(28,9) cast (shortest-decimal-string
  *     BigDecimal, HALF_UP — `BigDecimal.valueOf`), accumulated exactly
  *     in decimal, final value to double, / √outDim, ROUND(,6);
  *   - a null input element (or a vector whose length differs from the
  *     sign matrix's) poisons EVERY component to null — zip_with pads
  *     with nulls and the decimal accumulation propagates them;
  *   - a null vector is null.
  *
  * The heavy loop lives in a static helper the generated code calls
  * (the QuantizeSymmetric pattern), so BigDecimal accumulation never
  * inlines into the generated method body. */
object JlProject {
  /** signs: dim × outDim entries of ±1.0. */
  def compute(x: ArrayData, signs: Array[Array[Double]],
      scale: Double): ArrayData = {
    val dim = signs.length
    val outDim = signs(0).length
    val n = x.numElements()
    var poisoned = n != dim
    var i = 0
    while (!poisoned && i < n) {
      if (x.isNullAt(i)) poisoned = true
      i += 1
    }
    val out = new Array[Any](outDim)
    if (poisoned) return new GenericArrayData(out) // all nulls
    var j = 0
    while (j < outDim) {
      var acc = java.math.BigDecimal.ZERO
      i = 0
      while (i < dim) {
        acc = acc.add(java.math.BigDecimal.valueOf(x.getDouble(i) * signs(i)(j))
          .setScale(9, java.math.RoundingMode.HALF_UP))
        i += 1
      }
      out(j) = java.lang.Double.valueOf(
        java.math.BigDecimal.valueOf(acc.doubleValue() / scale)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  def column(vec: Column, signs: Array[Array[Int]], scale: Double): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expression(vec),
      signs.map(_.map(_.toDouble)), scale))
}

case class JlProject(child: Expression, signs: Array[Array[Double]],
    scale: Double) extends UnaryExpression {
  require(signs.nonEmpty && signs(0).nonEmpty &&
    signs.forall(_.length == signs(0).length),
    "jl_project needs a rectangular non-empty sign matrix")
  require(signs.forall(_.forall(s => s == 1.0 || s == -1.0)),
    "jl_project signs must be ±1")
  require(scale > 0, s"scale must be positive, got $scale")

  override def prettyName: String = "jl_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    JlProject.compute(input.asInstanceOf[ArrayData], signs, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.JlProject.compute($c, $signsRef, $scale)")
  }

  // case-class equality over Array params is REFERENCE equality, which
  // defeats expression canonicalization / subexpression elimination
  // (structurally identical instances never compare equal) — compare the
  // matrix by value instead
  override def equals(other: Any): Boolean = other match {
    case j: JlProject => child == j.child && scale == j.scale &&
      java.util.Arrays.deepEquals(
        signs.asInstanceOf[Array[AnyRef]], j.signs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.lang.Double.valueOf(scale),
    Integer.valueOf(java.util.Arrays.deepHashCode(
      signs.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
