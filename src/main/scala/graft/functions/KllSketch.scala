package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin-Lang-Liberty): bounded-memory, mergeable
  * rank/quantile summaries — the quantile member of the sketch family
  * ([[FreqItemsAgg]] heavy hitters, [[CountMinAgg]] point frequencies,
  * `hll_sketch_agg` distinct counts, `BloomFilterAggregate` membership).
  *
  * Why it matters at 100 TB: an exact percentile is a global sort or a
  * one-shot Greenwald-Khanna pass that cannot be reused, while a KLL
  * sketch is a ~KB binary VALUE — store one per (source, day) partition
  * and answer "p99 latency last month for source X" by merging the
  * relevant sketches, never re-reading rows. Merging is associative and
  * loses no accuracy class: rank error stays O(1/k) regardless of how
  * many sketches combined.
  *
  * Exactness contract (what the DuckDB oracle pins): while a sketch has
  * seen n <= k items it retains ALL of them and every quantile is the
  * exact order statistic — `getQuantile(p, INCLUSIVE)` returns the
  * smallest item whose inclusive rank reaches p, i.e. the ceil(p*n)-th
  * item in value order (dyadic p keeps the rank arithmetic float-exact in
  * both engines). Merged exact sketches stay exact while the union still
  * fits in k. Past k the sketch compacts with a RANDOM offset — estimates
  * become run-nondeterministic, so estimation mode is spec-bounded
  * (normalized rank error, [[KllSketchSpec]]) rather than hash-gated —
  * exactly the HLL/CMS gating pattern.
  */
object Kll {

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Aggregate a double column into a serialized KLL(k) sketch. */
  def sketch(value: Column, k: Int): Column =
    ColumnBridge.column(KllSketchAgg(
      ColumnBridge.expression(value.cast("double")), k).toAggregateExpression())

  /** Merge a column of serialized KLL sketches into one (sketch bytes). */
  def mergeSketches(sketches: Column, k: Int): Column =
    ColumnBridge.column(KllMergeAgg(
      ColumnBridge.expression(sketches), k).toAggregateExpression())

  /** Inclusive-rank quantile of a serialized sketch at probability `p`. */
  def quantile(sketch: Column, p: Double): Column = {
    require(p > 0.0 && p <= 1.0, s"quantile probability must be in (0,1], got $p")
    ColumnBridge.column(KllQuantile(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(p))))
  }

  /** Number of items the serialized sketch has seen (exact, survives merge). */
  def n(sketch: Column): Column =
    ColumnBridge.column(KllSketchN(ColumnBridge.expression(sketch)))
}

/** `kll_sketch(value, k)` → binary sketch bytes. Null inputs are skipped
  * like every SQL aggregate; an empty group yields an empty sketch whose
  * quantiles are null. */
case class KllSketchAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    b.merge(other)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = Kll.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge(sketchBytes, k)` → binary: second-stage union of stored
  * sketches — the "merge anywhere" half of the store/merge pattern. */
case class KllMergeAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.merge(Kll.heapify(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    b.merge(other)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = Kll.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketchBytes, p)` → double: inclusive-rank quantile.
  * Runs on final (already-aggregated) rows only, so CodegenFallback costs
  * nothing in the hot path. Empty sketch → null. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kll_quantile needs (binary, double), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(sketch: Any, p: Any): Any = {
    val sk = Kll.heapify(sketch.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketchBytes)` → bigint: exact item count seen by the sketch. */
case class KllSketchN(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any): Any =
    Kll.heapify(sketch.asInstanceOf[Array[Byte]]).getN

  override protected def withNewChildInternal(newChild: Expression): KllSketchN =
    copy(child = newChild)
}
