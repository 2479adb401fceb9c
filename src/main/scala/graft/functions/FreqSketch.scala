package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent items (heavy hitters) as a bounded-memory mergeable sketch —
  * the Misra-Gries summary.
  *
  * The exact formulation (`GROUP BY item ORDER BY count(*) DESC LIMIT k`)
  * shuffles one row per DISTINCT item; over a 100 TB text corpus the item
  * domain (words, urls, ngrams) is billions strong and the shuffle is the
  * job. This aggregate keeps at most `capacity` counters per partition,
  * merges partial summaries associatively, and guarantees every item with
  * true frequency > n/(capacity+1) survives with
  * `true - n/(capacity+1) <= estimate <= true`. When the domain is small
  * (distinct <= capacity) no decrement ever fires and counts are EXACT —
  * the property the DuckDB-oracled gate exercises.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
  * counters pairwise; if more than `capacity` survive, subtract the
  * (capacity+1)-th largest count from all and drop the non-positive.
  */
object FreqSketch {

  /** item -> count, never more than `capacity` entries. */
  final class Buffer(val capacity: Int) {
    val counts = new mutable.HashMap[String, Long]()

    def add(item: String): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1L)
        case None if counts.size < capacity => counts.update(item, 1L)
        case None =>
          // classic Misra-Gries step: the unseen item and one unit of every
          // resident counter cancel out; zeroed counters leave the summary.
          // O(capacity) per eviction — bounded by n/(capacity+1) evictions.
          counts.mapValuesInPlace((_, c) => c - 1L)
          val dead = counts.collect { case (k, c) if c <= 0L => k }.toSeq
          dead.foreach(counts.remove)
      }
    }

    /** Shrink to `capacity` entries by the Misra-Gries offset rule. */
    def shrink(): Unit =
      if (counts.size > capacity) {
        val cs = counts.values.toArray.sorted(Ordering[Long].reverse)
        val pivot = cs(capacity) // (capacity+1)-th largest
        val dead = counts.collect { case (k, c) if c - pivot <= 0 => k }.toSeq
        counts.mapValuesInPlace((_, c) => c - pivot)
        dead.foreach(counts.remove)
      }
  }
}

/** `freq_items(item, capacity, k)` → array<struct<item string, est bigint>>
  * of the k highest-count sketch survivors, (count desc, item asc) ordered. */
case class FreqItemsAgg(
    item: Expression, capacity: Int, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")
  require(k > 0 && k <= capacity, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def child: Expression = item
  override def prettyName: String = "freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): FreqSketch.Buffer =
    new FreqSketch.Buffer(capacity)

  override def update(b: FreqSketch.Buffer, input: InternalRow): FreqSketch.Buffer = {
    val v = item.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: FreqSketch.Buffer, other: FreqSketch.Buffer): FreqSketch.Buffer = {
    other.counts.foreach { case (item, c) =>
      b.counts.update(item, b.counts.getOrElse(item, 0L) + c)
    }
    b.shrink()
    b
  }

  override def eval(b: FreqSketch.Buffer): Any = {
    val top = b.counts.toArray
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(b: FreqSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity); out.writeInt(b.counts.size)
    b.counts.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new FreqSketch.Buffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val ib = new Array[Byte](len)
      in.readFully(ib)
      b.counts.update(new String(ib, "UTF-8"), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(item = newChild)
}

object FreqItems {
  /** Column builder: `freqItems(item, capacity, k)` — top-k heavy hitters
    * with at most `capacity` counters per partial buffer. Item is cast to
    * string. Exact whenever the distinct item count is <= capacity. */
  def freqItems(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(FreqItemsAgg(
      ColumnBridge.expression(item.cast("string")), capacity, k)
      .toAggregateExpression())
}
