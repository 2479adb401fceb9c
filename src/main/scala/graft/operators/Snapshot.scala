package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-version reconciliation: classify every key of two snapshots of
  * the same table as added / removed / changed / unchanged, with the
  * exact set of columns that changed — the data-engineering audit
  * primitive behind "what did last night's load actually do" and the
  * validation side of [[MergeInto]]/[[Scd]] (which APPLY changes; this
  * OBSERVES them).
  *
  * Scale shape: one full outer join on the key — the one unavoidable
  * key-partitioned shuffle — and per-row null-safe column comparisons;
  * no window, no driver state. The per-column change mask is computed
  * with `<=>` so null→value and value→null transitions count as
  * changes, never as accidental matches.
  */
object Snapshot {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing
    * `compareCols`. Output: keyCols + (`change_type` ∈
    * added|removed|changed|unchanged, `changed_cols` — the
    * comma-joined sorted list of differing columns, '' unless
    * changed). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
      .toDF(keyCols ++ compareCols.map("__o_" + _) :+ "__in_old": _*)
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
      .toDF(keyCols ++ compareCols.map("__n_" + _) :+ "__in_new": _*)
    val joined = o.join(n, keyCols, "full_outer")
    val diffs: Seq[Column] = compareCols.sorted.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    val changedCols = concat_ws(",", diffs: _*)
    val changeType = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    joined.select(keyCols.map(col) ++ Seq(
      changeType.as("change_type"),
      when(changeType === "changed", changedCols)
        .otherwise(lit("")).as("changed_cols")): _*)
  }
}
