package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation / A-B analysis operators beyond the plain test
  * statistics (`Profiling.welchTTest` / `proportionsZTest` / `anovaF`):
  * CUPED variance reduction (Deng et al., WSDM 2013) — adjust the
  * experiment metric by a pre-experiment covariate so variant means
  * keep their expectation but shed the covariate-explained variance,
  * shrinking confidence intervals without more traffic.
  *
  *   θ  = cov(X, Y) / var(X)          (pooled across variants)
  *   Y′ = Y − θ·(X − mean(X))
  *
  * Scale shape: ONE group-keyed aggregate produces per-variant decimal
  * power sums; the pooled θ and global mean fold from those k rows (a
  * broadcast-sized second aggregate). Nothing but the variant-keyed
  * shuffle touches the data.
  *
  * Cross-engine: Σx, Σy, Σxy, Σx², Σy² accumulate per-term ROUND(,6)
  * DECIMAL(38,6); θ and the adjusted means derive in fixed-order
  * DOUBLE; outputs round to 6. Rows with a null metric or covariate
  * drop (listwise, like the correlation operators).
  */
object Experiment {

  /** Per-variant CUPED panel: `n`, raw `mean_y`, adjusted `mean_y_adj`,
    * plus the pooled `theta` and the variance-reduction ratio
    * `var_ratio` = 1 − ρ²(X,Y) repeated on every row (panel-sized). */
  def cupedAdjust(df: DataFrame, variantCol: String, metricCol: String,
      covariateCol: String): DataFrame = {
    val y = col(metricCol)
    val x = col(covariateCol)
    val d6 = "decimal(38,6)"
    val perVariant = df.where(y.isNotNull && x.isNotNull)
      .groupBy(col(variantCol))
      .agg(
        count(lit(1)).as("__n"),
        sum(round(x, 6).cast(d6)).as("__sx"),
        sum(round(y, 6).cast(d6)).as("__sy"),
        sum(round(x * y, 6).cast(d6)).as("__sxy"),
        sum(round(x * x, 6).cast(d6)).as("__sxx"),
        sum(round(y * y, 6).cast(d6)).as("__syy"))
    // pooled scalars from the k-row panel — aggregate SUM over decimal
    // stays decimal in both engines (the `+` operator would not)
    val pooled = perVariant.agg(
      sum(col("__n")).as("__nn"),
      sum(col("__sx")).cast("double").as("__tx"),
      sum(col("__sy")).cast("double").as("__ty"),
      sum(col("__sxy")).cast("double").as("__txy"),
      sum(col("__sxx")).cast("double").as("__txx"),
      sum(col("__syy")).cast("double").as("__tyy"))
    val nn = col("__nn")
    val covXY = col("__txy") - col("__tx") * col("__ty") / nn
    val varX = col("__txx") - col("__tx") * col("__tx") / nn
    val varY = col("__tyy") - col("__ty") * col("__ty") / nn
    val theta = covXY / varX
    val globalMeanX = col("__tx") / nn
    perVariant.crossJoin(broadcast(pooled))
      .select(
        col(variantCol),
        col("__n").cast("bigint").as("n"),
        round(col("__sy").cast("double") / col("__n"), 6).as("mean_y"),
        // mean(Y) − θ·(mean(X) − global mean(X)) per variant
        round(col("__sy").cast("double") / col("__n") -
          theta * (col("__sx").cast("double") / col("__n") - globalMeanX),
          6).as("mean_y_adj"),
        round(theta, 6).as("theta"),
        round(lit(1.0) - covXY * covXY / (varX * varY), 6).as("var_ratio"))
  }
}
