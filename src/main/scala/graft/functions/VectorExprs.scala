package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions over `array<float>` embedding columns.
  *
  * The composable alternative (`zip_with` + `aggregate` higher-order
  * functions) walks each array three times through interpreted lambda
  * dispatch; these expressions do one fused pass in generated Java — the
  * preference order in the build brief: built-in functions, then a native
  * `Expression` with `doGenCode`, then UDFs last.
  */
object VectorExprs {

  /** cosine(a, b) ∈ [-1, 1]; null if either side is null or a norm is 0.
    * THROWS on a length mismatch (as DuckDB's `list_cosine_similarity`
    * does) — a ragged corpus must fail loudly, never prefix-truncate. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** dot(a, b) in a single fused pass. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** argmin over `cents` of squared-L2 distance to `v` (array<double>),
    * ties to the LOWEST index — the k-means assignment step fused into
    * one generated loop. The matrix rides along as a codegen reference
    * object, so re-planning with new centroids reuses the compiled
    * class (an expression tree of k·dim literal terms would re-generate
    * distinct source every iteration — and at this size falls out of
    * codegen entirely into interpreted eval). */
  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents))

  /** Fused symmetric int8 quantization: one primitive pass computes
    * `scale = max|x|/127` and codes `round(x/scale)` — byte-identical to
    * the HOF twin `Quantization.quantize(v, symmetricScale(v))` but
    * codegen-compatible. The HOF form (`aggregate`/`transform`) is
    * CodegenFallback in Spark: the WHOLE projection drops to interpreted
    * per-element expression dispatch — ~30× at the 50M probe rung, where
    * the interpreted `Divide.eval`/`RoundBase.eval` stack WAS the
    * generate stage (caught by jstack on the round-8 quantized rung). */
  def quantizeSymmetric(v: Column): Column =
    ColumnBridge.column(QuantizeSymmetric(ColumnBridge.expression(v)))

  /** argmax over `cents` of COSINE similarity to `v` (array<float>),
    * ties to the LOWEST index — the IVF coarse-assignment step fused
    * into one generated map-side loop. Replaces the k-row crossJoin +
    * per-row window argmax, which shuffles corpus×k rows through an
    * exchange (365 s vs map-side at the 10M×64 probe rung). Per
    * centroid, dot/nx/ny accumulate left-to-right exactly like
    * [[CosineSimilarity]] and the comparison is STRICT (>), so the
    * result is bit-identical to `row_number() OVER (ORDER BY cos DESC,
    * cid) = 1` in a generated oracle; zero-norm sides yield no cosine
    * and never win (an all-null row lands on index 0, matching
    * DESC-NULLS-LAST + cid ordering). */
  def nearestCentroidCosine(v: Column, cents: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroidCosine(ColumnBridge.expression(v), cents))
}

/** Shared loud-failure contract for the vector expressions: a length
  * mismatch is a data bug (ragged corpus, wrong model dim), never
  * something to silently prefix-truncate — DuckDB's `list_cosine_similarity`
  * errors on mismatch and these expressions now mirror that. Public (not
  * package-private) because generated codegen classes call it. */
object VectorExprContract {
  def mismatch(op: String, n1: Int, n2: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"$op: vector length mismatch ($n1 vs $n2) — inputs must share one dimension; " +
        "pad/re-embed the ragged rows or filter them out explicitly")
}

abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** Fused dot+norms cosine similarity over two float vectors. */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "cosine_similarity"

  /** Null-INTRODUCING: a zero-norm side yields null even when both
    * inputs are non-null, so nullability must not derive from the
    * children. Without this override, non-nullable inputs (literals,
    * `when`-chain outputs) make codegen skip the isNull declaration the
    * generated body assigns — an undeclared-variable compile error that
    * silently drops the whole projection to interpreted eval. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw VectorExprContract.mismatch(prettyName, n, y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.VectorExprContract.mismatch("$prettyName", $n, $b.numElements());
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** k-means assignment: index of the nearest centroid by squared L2,
  * ties to the lowest index. Distances accumulate left-to-right over the
  * dimensions (`0.0 + t_0 + t_1 + …`), matching a SQL `list_reduce`
  * fold — the property that keeps the clustering loop oracle-exact.
  * All centroids must share one dimension (checked at construction) and
  * every input vector must match it (checked per row, throwing — see
  * [[VectorExprContract]]). */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  require(cents.nonEmpty, "nearest_centroid needs at least one centroid")
  require(cents.forall(_.length == cents(0).length),
    s"nearest_centroid: centroids must share one dimension, got ${cents.map(_.length).distinct.mkString(",")}")
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = cents(0).length
    if (x.numElements() != n)
      throw VectorExprContract.mismatch(prettyName, x.numElements(), n)
    var best = 0; var bestD = Double.PositiveInfinity
    var cid = 0
    while (cid < cents.length) {
      val cv = cents(cid)
      var d = 0.0; var i = 0
      while (i < n) {
        val t = x.getDouble(i) - cv(i)
        d += t * t; i += 1
      }
      if (d < bestD) { bestD = d; best = cid }
      cid += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val cid = ctx.freshName("cid"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val n = ctx.freshName("n"); val cv = ctx.freshName("cv")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $m[0].length;
         |if ($a.numElements() != $n) {
         |  throw graft.functions.VectorExprContract.mismatch("$prettyName", $a.numElements(), $n);
         |}
         |int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |for (int $cid = 0; $cid < $m.length; $cid++) {
         |  double[] $cv = $m[$cid];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = $a.getDouble($i) - $cv[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $cid; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  // value-based equality over the centroid matrix (case-class equals is
  // reference-based on arrays, defeating expression dedup — see JlProject)
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroid => child == n.child &&
      java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], n.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.deepHashCode(
      cents.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** IVF coarse assignment: index of the max-cosine centroid, ties to the
  * lowest index (see [[VectorExprs.nearestCentroidCosine]] for the
  * parity contract). The corpus vector's norm is accumulated once (its
  * fold is independent of the centroid loop, so hoisting is
  * bit-identical). */
case class NearestCentroidCosine(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression {
  require(cents.nonEmpty, "nearest_centroid_cosine needs at least one centroid")
  require(cents.forall(_.length == cents(0).length),
    s"nearest_centroid_cosine: centroids must share one dimension, got ${cents.map(_.length).distinct.mkString(",")}")
  override def prettyName: String = "nearest_centroid_cosine"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var nx = 0.0
    var i = 0
    val nv = x.numElements()
    val n = cents(0).length
    if (nv != n) throw VectorExprContract.mismatch(prettyName, nv, n)
    while (i < nv) { val xv = x.getFloat(i).toDouble; nx += xv * xv; i += 1 }
    var best = Double.NegativeInfinity; var bestCid = 0
    var cid = 0
    while (cid < cents.length) {
      val cv = cents(cid)
      var dot = 0.0; var ny = 0.0
      i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = cv(i).toDouble
        dot += xv * yv; ny += yv * yv; i += 1
      }
      if (nx != 0.0 && ny != 0.0) {
        val cos = dot / (math.sqrt(nx) * math.sqrt(ny))
        if (cos > best) { best = cos; bestCid = cid }
      }
      cid += 1
    }
    java.lang.Integer.valueOf(bestCid)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", cents, "float[][]")
      val cid = ctx.freshName("cid"); val i = ctx.freshName("i")
      val nv = ctx.freshName("nv"); val n = ctx.freshName("n")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val dot = ctx.freshName("dot"); val cos = ctx.freshName("cos")
      val xv = ctx.freshName("xv"); val xw = ctx.freshName("xw")
      val yv = ctx.freshName("yv"); val cv = ctx.freshName("cv")
      val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
      s"""
         |int $nv = $a.numElements();
         |int $n = $m[0].length;
         |if ($nv != $n) {
         |  throw graft.functions.VectorExprContract.mismatch("$prettyName", $nv, $n);
         |}
         |double $nx = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  $nx += $xv * $xv;
         |}
         |double $best = Double.NEGATIVE_INFINITY; int $bestCid = 0;
         |for (int $cid = 0; $cid < $m.length; $cid++) {
         |  float[] $cv = $m[$cid];
         |  double $dot = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xw = (double) $a.getFloat($i);
         |    double $yv = (double) $cv[$i];
         |    $dot += $xw * $yv; $ny += $yv * $yv;
         |  }
         |  if ($nx != 0.0 && $ny != 0.0) {
         |    double $cos = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |    if ($cos > $best) { $best = $cos; $bestCid = $cid; }
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  // value-based equality over the centroid matrix (see NearestCentroid)
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroidCosine => child == n.child &&
      java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], n.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.deepHashCode(
      cents.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Plain dot product, same fused-pass shape. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw VectorExprContract.mismatch(prettyName, n, y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.VectorExprContract.mismatch("$prettyName", $n, $b.numElements());
         |}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused per-vector symmetric int8 quantization (see
  * [[VectorExprs.quantizeSymmetric]]).
  *
  * Parity contract with the HOF twin
  * `Quantization.quantize(v, Quantization.symmetricScale(v))`, element
  * for element:
  *   - scale = max|x_i| over non-null elements (float→double per
  *     element) / 127.0;
  *   - scale == 0 (all-zero or all-null vector) → ALL codes 0, null
  *     elements included (the twin's `otherwise(0)` branch);
  *   - scale > 0 → null element → null code; else
  *     `round(x/scale)` with Spark's exact ROUND semantics
  *     (BigDecimal HALF_UP — `floor(v+0.5)` is NOT equivalent at
  *     values like 0.49999999999999994 where the +0.5 itself rounds);
  *   - a non-finite element (NaN/Inf) throws loudly — the twin dies on
  *     an ANSI NaN→int cast; this expression names the defect instead.
  *
  * The heavy loop lives in a static JVM helper the generated code calls,
  * so the expression composes into WholeStageCodegen without inlining a
  * BigDecimal loop into the generated method body. */
object QuantizeSymmetric {
  /** `isFloat`: element accessor width of the incoming ArrayData. */
  def compute(x: ArrayData, isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
          throw new IllegalArgumentException(
            s"quantize_symmetric: non-finite element $v at index $i — " +
              "clean or filter non-finite embeddings before quantizing")
        val a = math.abs(v)
        if (a > amax) amax = a
      }
      i += 1
    }
    val scale = amax / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (scale == 0.0) out(i) = 0.toByte
      else if (x.isNullAt(i)) out(i) = null
      else {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = java.math.BigDecimal.valueOf(v / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValue().toByte
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class QuantizeSymmetric(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_symmetric"

  override def dataType: DataType = ArrayType(ByteType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    QuantizeSymmetric.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantizeSymmetric.compute($c, $isFloat)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
