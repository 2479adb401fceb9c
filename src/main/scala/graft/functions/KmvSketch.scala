package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct sketch — cardinality ALGEBRA for corpus
  * slices, not just cardinality.
  *
  * `approx_count_distinct` (HLL++) answers |A| per group, and Spark's
  * DataSketches HLL can union — but NO HLL variant estimates an
  * INTERSECTION, which is the question slice analysis actually asks
  * ("how many customers/urls/tokens do these two corpus slices share?").
  * A KMV sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07) is the
  * classic mergeable summary that closes the set algebra: keep the k
  * smallest DISTINCT hash values of each set; then
  *
  *   - estimate:  D(A) ≈ (k−1) · M / h_(k)   (h uniform on (0, M)),
  *                EXACT (= sketch size) whenever |A| < k;
  *   - union:     the k smallest of K(A) ∪ K(B) IS K(A∪B) — exact, closed;
  *   - intersect: J = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| estimates the
  *                Jaccard similarity, and |A∩B| ≈ J · D(A∪B).
  *
  * Scale shape: the aggregate keeps ≤ k longs per group per partition
  * (a tree-set, O(log k) per row with early reject above the current
  * max), partials merge associatively, so at most k·partitions values
  * per group reach the exchange — the same bounded-shuffle contract as
  * [[TopKAgg]]. Union/intersection run AFTER aggregation over k-sized
  * arrays as codegen'd array expressions — map-side, no extra shuffle.
  *
  * Determinism contract: the sketch is a pure function of the input's
  * distinct hash set — no RNG, no insertion-order dependence — so with a
  * cross-engine hash (md5-60bit, [[graft.operators.SetSketch.hash60]])
  * every value, estimate, and overlap is DuckDB-reproducible and the
  * gates hash-match. Inputs must be non-negative (the estimator needs h
  * uniform on (0, M)); a negative hash throws rather than silently
  * skewing estimates.
  */
object KmvSketch {

  /** Bounded sorted set of the k smallest distinct non-negative longs. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit = {
      require(h >= 0, s"kmv_sketch input must be a non-negative hash, got $h")
      if (set.size < k) { set.add(h); () }
      else if (h < set.last()) {
        // TreeSet.add dedups; only shrink when a genuinely new value landed
        if (set.add(h)) { set.pollLast(); () }
      }
    }

    def toArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }
}

/** `kmv_sketch(hash, k)` → array<bigint>: the k smallest distinct values
  * of `hash` in ascending order (fewer when the group has fewer distinct
  * values). Nulls are skipped like SQL aggregates; negatives throw. */
case class KmvAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvSketch.Buffer = new KmvSketch.Buffer(k)

  override def update(b: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    val it = other.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvSketch.Buffer): Any = new GenericArrayData(b.toArray)

  override def serialize(b: KmvSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvSketch.Buffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object Kmv {
  /** Column builder: `kmv_sketch(hash, k)`. `hash` is cast to long;
    * pass a non-negative uniform hash (e.g.
    * [[graft.operators.SetSketch.hash60]]). */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())
}
