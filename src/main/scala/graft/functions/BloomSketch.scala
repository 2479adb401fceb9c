package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level access to Catalyst's Bloom-filter sketch expressions
  * (the machinery behind Spark's runtime row-level join filters, not
  * exposed through the public `functions` API).
  *
  * `bloomAgg` builds the filter as a DISTRIBUTED aggregate — each
  * partition sketches locally and the bitsets OR-merge up the partial
  * aggregation tree — so no executor or driver ever materializes the key
  * set, unlike `DataFrameStatFunctions.bloomFilter` which funnels every
  * key through a driver-side merge. `mightContain` probes codegen'd,
  * map-side. Both operate on 64-bit pre-hashed keys (pass `xxhash64(col)`
  * on both the build and probe side).
  */
object BloomSketch {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (the standard -n·ln p / ln²2 sizing). */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got $n/$fpp")
    math.max(64L, (-n * math.log(fpp) / (math.log(2) * math.log(2))).ceil.toLong)
  }

  /** Aggregate: Bloom filter (as a binary column) over a LongType hashed
    * key column. */
  def bloomAgg(hashedKey: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashedKey),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression())

  /** Probe: true when `hashedKey` may be in `bloom` (false ⇒ definitely
    * absent — Bloom filters have no false negatives). `might_contain`
    * requires its filter operand to be constant-shaped, so the 1-row
    * aggregate DataFrame is attached as a scalar subquery (the same shape
    * Spark's runtime-filter injection emits); the subquery executes once
    * and its result ships with the probe-side tasks. */
  def mightContain(bloomDf: org.apache.spark.sql.DataFrame, hashedKey: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.scalarSubquery(bloomDf), ColumnBridge.expression(hashedKey)))
}
