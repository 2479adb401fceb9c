package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog (CDC) net-effect compaction: collapse a batch of I/U/D
  * operations per key into the single operation that has the same
  * effect — the Debezium/materialize-downstream primitive that keeps
  * a replayed batch idempotent and minimal:
  *
  *   first I … last D → (nothing: the key both appeared and vanished)
  *   first I … last I/U → one INSERT carrying the final values
  *   first U/D … last D → one DELETE
  *   first U/D … last I/U → one UPDATE carrying the final values
  *
  * Scale shape: ONE key-ordered window (row_number forward and
  * backward in the same pass) picks each key's first and last change;
  * no self-join, state bounded by the key's own batch rows.
  */
object Changelog {

  /** Compact `changes` (op ∈ 'I'|'U'|'D') to net effects. Output: key,
    * `net_op`, and the FINAL `valueCols` (from the last change; for a
    * net DELETE they carry the last-seen values, which downstream
    * sinks ignore). Keys whose net effect is nothing are absent. */
  def netEffect(changes: DataFrame, keyCol: String, opCol: String,
      tsCol: String, tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val rev = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val marked = changes
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__rr", row_number().over(rev))
      .withColumn("__first_op", first(col(opCol)).over(ord))
    val last = marked.where(col("__rr") === 1)
    last.select(Seq(col(keyCol),
        when(col("__first_op") === "I" && col(opCol) === "D", lit(null))
          .when(col("__first_op") === "I", lit("I"))
          .when(col(opCol) === "D", lit("D"))
          .otherwise(lit("U")).as("net_op")) ++
        valueCols.map(col): _*)
      .where(col("net_op").isNotNull)
  }
}
