package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingest gate a training
  * pipeline runs before a batch is allowed into the corpus (null
  * checks, range checks, domain membership, key uniqueness), in the
  * style of Deequ/Great Expectations but as ONE aggregation pass.
  *
  * Scale shape: every row rule compiles to a conditional sum inside a
  * single global aggregate over the batch — adding a rule adds a column
  * to the partial-agg buffer, never a pass over the data. Key-uniqueness
  * rules ride the same aggregate as `count_distinct` (Spark plans the
  * expand alongside the sums — still one shuffle, carrying one buffer
  * row per partition). The unpivot to one-row-per-rule happens on the
  * 1-row result, not the data.
  *
  * Violation semantics: a row violates a rule when the predicate is
  * FALSE or NULL (an expectation that cannot be evaluated did not
  * hold — the Deequ convention). A uniqueness rule counts
  * `n_rows − count(distinct key)` duplicate rows.
  */
object Expectations {

  /** Audits `df` against per-row `rules` (name → predicate that should
    * hold) and `uniqueKeys` (name → key columns that should be unique).
    * Returns one row per rule: (`rule`, `n_rows`, `n_violations`,
    * `pass`), in rule declaration order under its two families. */
  def audit(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "audit needs at least one rule")
    val names = rules.map(_._1) ++ uniqueKeys.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate rule name(s): ${names.diff(names.distinct).distinct.mkString(", ")}")
    names.foreach(n => require(!n.contains("'") && !n.contains("`"),
      s"rule name must not quote: $n"))

    val rowAggs = rules.zipWithIndex.map { case ((_, p), i) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    }
    val keyAggs = uniqueKeys.zipWithIndex.map { case ((_, cols), i) =>
      countDistinct(struct(cols.map(col): _*)).as(s"__k$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), (rowAggs ++ keyAggs): _*)
    val items =
      (rules.zipWithIndex.map { case ((n, _), i) => s"'$n', `__v$i`" } ++
        uniqueKeys.zipWithIndex.map { case ((n, _), i) =>
          s"'$n', `__n` - `__k$i`"
        }).mkString(", ")
    val nPairs = rules.size + uniqueKeys.size
    one.selectExpr(s"stack($nPairs, $items) AS (rule, n_violations)",
        "`__n` AS n_rows")
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Per-key sequence-contiguity audit: keys whose integral `seqCol`
    * has holes between its min and max (missing invoice lines, skipped
    * batch ids, gapped page numbers — the classic completeness check
    * on anything that should count 1..n).
    *
    * Scale shape: one (key)-grouped aggregate — min, max, distinct
    * count — nothing per-gap; `n_missing` is pure arithmetic on the
    * three. Duplicated sequence numbers don't mask holes (the distinct
    * count ignores them). Nulls drop first.
    *
    * Output: (key, seq_min, seq_max, n_present, n_missing) for keys
    * with n_missing > 0. */
  def sequenceGaps(df: DataFrame, keyCol: String,
      seqCol: String): DataFrame =
    df.where(col(seqCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(col(seqCol)).as("seq_min"), max(col(seqCol)).as("seq_max"),
        countDistinct(col(seqCol)).as("n_present"))
      .withColumn("n_missing",
        col("seq_max") - col("seq_min") + lit(1) - col("n_present"))
      .where(col("n_missing") > 0)
}
