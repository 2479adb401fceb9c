package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-state maintenance — merge-on-ingest instead of
  * recompute-on-read. A 100 TB table grows by batches; recomputing a
  * grouped aggregate over the whole table per batch re-reads everything,
  * while maintaining a mergeable STATE table (one row per key holding
  * algebraic partials) costs one aggregation over the NEW batch plus a
  * keyed merge against state that is vocabulary-sized, not corpus-sized.
  * Same algebra as partial+final aggregation, lifted to storage — and
  * the same reason the engine's sketches (HLL `q_a_hll`, Misra-Gries,
  * Count-Min) were built mergeable.
  *
  * State schema: (key…, `cnt`, `sum` DECIMAL(38,6), `min`, `max`).
  * Decimal sums are order- and batch-split-invariant, so any partition
  * of the corpus into batches yields the IDENTICAL state — the property
  * the gate hashes cross-engine. [[finish]] derives presentation values
  * (avg) without touching the partials.
  */
object Incremental {

  /** Aggregates one ingest batch into mergeable state. */
  def aggState(batch: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(38,6)")).as("sum"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))

  /** Merges two state tables (either may hold keys the other lacks).
    * Associative and commutative — a tree of merges over any batch order
    * converges to the same state. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))

  /** Presentation view over the partials: adds `avg` (sum/cnt divided in
    * DOUBLE, rounded — the cross-engine float rule). */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("avg",
      round(col("sum").cast("double") / col("cnt"), 6))
}
