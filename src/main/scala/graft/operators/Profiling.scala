package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** EDA / profiling surface (SURVEY.md §2.4: A1-A10, P9).
  *
  * The reference profiles with one Spark job per column (null counts,
  * distinct counts, correlation, quantiles — `/root/reference/src/main/
  * helper_methods.py:58-79,142-147`). O(columns) separate scans is the
  * documented anti-pattern (SURVEY.md §4.3); here each profile is a single
  * pass batching all columns into one aggregate job.
  */
object Profiling {

  /** A4 rewrite: all per-column distinct counts in ONE job. */
  def distinctCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => countDistinct(col(c)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate variant for 100 TB profiling: HLL++ sketches, still one pass. */
  def approxDistinctCounts(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** P9 rewrite: all per-column null counts in ONE pass
    * (vs `where(isNull).count()` per column, `helper_methods.py:68`). */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Numeric-column discovery: integer-typed with >30 distinct values
    * (`helper_methods.py:58-62`). One distinct-count job total, not one per
    * column. */
  def numericColumns(df: DataFrame, threshold: Long = 30): Seq[String] = {
    val intCols = df.schema.fields.collect {
      case f if f.dataType == IntegerType => f.name
    }.toSeq
    if (intCols.isEmpty) Seq.empty
    else {
      val counts = distinctCounts(df, intCols).first()
      intCols.zipWithIndex.collect {
        case (c, i) if counts.getLong(i) > threshold => c
      }
    }
  }

  /** A5+A6+P9 in one profile: per numeric column — null count, Pearson corr
    * with `target`, and the 5/25/50/75/95 quantiles
    * (`helper_methods.py:65-79`). Quantiles use the Greenwald-Khanna sketch
    * via approxQuantile (relativeError configurable); corr/nulls batch into
    * a single aggregate pass.
    */
  def dataDistribution(df: DataFrame, cols: Seq[String], target: String = "ArrDelay",
      relativeError: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probs = Array(0.05, 0.25, 0.5, 0.75, 0.95)
    // one job: all quantiles for all columns
    val quantiles = df.stat.approxQuantile(cols.toArray, probs, relativeError)
    // one job: all null counts + correlations
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        corr(col(c), col(target)).as(s"${c}__corr"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(2 * i), row.getAs[Any](2 * i + 1) match {
        case null => Double.NaN
        case d: Double => d
      }, quantiles(i)(0), quantiles(i)(1), quantiles(i)(2), quantiles(i)(3), quantiles(i)(4))
    }.toDF("column", "nulls", "corr", "quantile_05", "quantile_25",
      "quantile_50", "quantile_75", "quantile_95")
  }

  /** A1: per-group mean of the target (`helper_methods.py:159`). */
  def groupMean(df: DataFrame, groupCol: String, target: String = "ArrDelay"): DataFrame =
    df.groupBy(col(groupCol)).agg(avg(col(target)).as("MeanArrDelay"))

  /** P4: max/min ratio gate over the group means (`helper_methods.py:162`). */
  def meanSpreadRatio(groupMeans: DataFrame): Double =
    groupMeans.selectExpr("max(MeanArrDelay) / min(MeanArrDelay)")
      .first().getDouble(0)

  /** A8: confusion matrix / frequency crosstab
    * (`tools/generate_report_figures.py:43-44`). Distributed pivot, not a
    * driver-side pandas crosstab. */
  def crosstab(df: DataFrame, actual: String, predicted: String): DataFrame =
    df.groupBy(col(actual)).pivot(predicted).count().na.fill(0L)

  /** A9: mean of two measures by group (`tools/generate_report_figures.py:122`). */
  def meanByGroup(df: DataFrame, groupCol: String, m1: String, m2: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(avg(col(m1)).as(s"avg_$m1"), avg(col(m2)).as(s"avg_$m2"))

  /** A11 as pure SQL aggregates: MAE / RMSE without an evaluator pass each
    * (`helper_methods.py:346-369` equivalents). */
  def regressionMetrics(df: DataFrame, label: String = "ArrDelay",
      prediction: String = "prediction"): DataFrame =
    df.agg(
      avg(abs(col(prediction) - col(label))).as("mae"),
      sqrt(avg(pow(col(prediction) - col(label), 2))).as("rmse"))
}
