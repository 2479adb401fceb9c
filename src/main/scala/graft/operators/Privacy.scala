package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk audits — the privacy gate a dataset passes
  * before release or training: k-anonymity (every quasi-identifier
  * combination is shared by ≥ k records) and l-diversity (each
  * combination carries ≥ l distinct sensitive values, so membership in
  * a group doesn't disclose the attribute). The structured-data
  * complement to the text-side PII scrubbing.
  *
  * Scale shape: ONE aggregate keyed on the quasi-identifier columns
  * computing group size and distinct-sensitive count together; the
  * output is restricted to VIOLATING groups, so result size is bounded
  * by the risk surface, not the table.
  */
object Privacy {

  /** Groups failing k-anonymity (n < k) or l-diversity
    * (distinct sensitive < l). Output: quasiCols +
    * (n, n_sensitive, k_ok, l_ok). Null QI values form their own
    * groups (a null combination is as linkable as any other). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(
        col("n"), col("n_sensitive"),
        (col("n") >= k).as("k_ok"),
        (col("n_sensitive") >= l).as("l_ok")): _*)
      .where(!col("k_ok") || !col("l_ok"))
  }
}
