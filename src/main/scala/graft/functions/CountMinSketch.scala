package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch: bounded-memory frequency estimation, EXACTLY
  * mergeable (counter arrays sum), the complement to the Misra-Gries
  * summary ([[FreqItemsAgg]]):
  *
  *  - Misra-Gries answers "which items are frequent" (top-k) with <=
  *    capacity counters but can only report survivors;
  *  - Count-Min answers "how frequent is THIS item" for ANY item, with
  *    `depth` x `width` counters: est(x) = min over rows d of
  *    counter[d][hash_d(x) % width], so `true <= est <= true + eps*n`
  *    with eps = e/width at confidence 1 - exp(-depth).
  *
  * Because merging is plain element-wise addition, partial sketches
  * combine associatively up the aggregation tree AND across streaming
  * micro-batch state — the same property that let the streaming top-k
  * shard its state. When every observed item's slot is collision-free in
  * at least one row (guaranteed-checkable for a small fixed domain, e.g.
  * an event-type column), estimates are EXACT — the case the
  * DuckDB-oracled gate pins.
  */
object CountMinSketch {

  /** Row-`d` slot of `item` — MurmurHash3 seeded by the row index. */
  def slot(item: String, d: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(item, d), width)

  /** Point estimate from a raw counter array (row-major depth x width). */
  def estimate(counters: Array[Long], width: Int, depth: Int, item: String): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counters(d * width + slot(item, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }
}

/** `cms_estimates(item, width, depth, probes)` → array<struct<item string,
  * est bigint>> of Count-Min point estimates for each probe item, in the
  * given probe order. Null items are skipped like SQL aggregates. */
case class CountMinAgg(
    item: Expression, width: Int, depth: Int, probes: Seq[String],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width > 0 && depth > 0, s"need positive width/depth, got $width/$depth")
  require(probes.nonEmpty, "cms_estimates needs at least one probe item")

  override def child: Expression = item
  override def prettyName: String = "cms_estimates"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        b(d * width + CountMinSketch.slot(s, d, width)) += 1L
        d += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(probes.map { p =>
      InternalRow(UTF8String.fromString(p),
        CountMinSketch.estimate(b, width, depth, p))
    }.toArray[Any])

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    var i = 0
    while (i < b.length) { out.writeLong(b(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(item = newChild)
}

object CountMin {
  /** Column builder: Count-Min point estimates for `probes` over the
    * (string-cast) item column. */
  def estimates(item: Column, probes: Seq[String], width: Int, depth: Int): Column =
    ColumnBridge.column(CountMinAgg(
      ColumnBridge.expression(item.cast("string")), width, depth, probes)
      .toAggregateExpression())
}
