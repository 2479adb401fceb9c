package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** The retained-volume cap of [[RankTopKAgg.Buffer]]: `k` bounds the
  * threshold structure but NOT the retained rows (boundary ties are
  * legitimately unbounded), so the buffer must fail LOUDLY — with the
  * remediation in the message — instead of silently growing toward the
  * single-byte-array serialize limit. */
class RankTopKCapSpec extends SparkSpec {

  private val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType))
  private def row(v: Long) = proj(InternalRow(v)).copy()

  test("pervasive boundary ties trip the retained-bytes cap with a clear error") {
    // constant order key, k=1: every row ties rank 1, nothing compacts
    val b = new RankTopKAgg.Buffer(1, false, maxRetainedBytes = 4096)
    val e = intercept[IllegalStateException] {
      var i = 0L
      while (i < 100000L) { b.insert(7L, 0L, row(i)); i += 1 }
    }
    assert(e.getMessage.contains("retained set exceeded"))
    assert(e.getMessage.contains("row_number()"))
  }

  test("distinct keys compact under the same tiny cap — no spurious abort") {
    // strictly rising keys, k=1: the threshold rises with every insert,
    // so compaction keeps the retained set at O(k) and the cap never
    // trips even over many more rows than the tied case aborted at
    val b = new RankTopKAgg.Buffer(1, false, maxRetainedBytes = 4096)
    var i = 0L
    while (i < 200000L) { b.insert(i, i, row(i)); i += 1 }
    assert(b.size <= 64) // lazily compacted, bounded well under the cap
  }

  test("dense mode trips the cap too (k distinct keys over many rows)") {
    val b = new RankTopKAgg.Buffer(2, true, maxRetainedBytes = 4096)
    val e = intercept[IllegalStateException] {
      var i = 0L
      while (i < 100000L) { b.insert(i % 2, 0L, row(i)); i += 1 }
    }
    assert(e.getMessage.contains("rank_top_k retained set"))
  }

  test("production default cap is 256 MB") {
    assert(RankTopKAgg.MaxRetainedBytes === (256L << 20))
  }
}
