package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier-style survival/churn curves per cohort group: for each
  * group, the fraction of entities still active after `t` periods — the
  * longitudinal twin of [[Cohort.retention]] (retention counts each
  * offset independently; survival chains the per-period hazards, the
  * product-limit estimator).
  *
  * Every entity's observed lifetime is `last − first` active period;
  * the last activity is treated as churn (no censoring — an analysis
  * over a CLOSED observation window). At each lifetime `t` with `d`
  * churns out of `n` still at risk, the hazard factor is `1 − d/n`, and
  * S(t) is the running product of factors up to `t`.
  *
  * Scale shape: one entity-keyed aggregate (min/max period per entity),
  * one (group, lifetime)-keyed count — both with map-side partials —
  * then the running product as a window over the TINY per-group lifetime
  * table (rows = distinct lifetimes, bounded by the calendar), keyed by
  * group: no global sort, nothing driver-side.
  *
  * Cross-engine reproducibility: the running product is
  * `exp(Σ ln(factor))` with each `ln` rounded to 6 (the libm-parity
  * rule) and the sum accumulated as DECIMAL — order-independent — and
  * the final `exp` rounded to 6 (correctly-rounded to the last ulp,
  * killed by the rounding).
  */
object Survival {

  /** Returns (`group`, `t`, `n_risk`, `churned`, `survival`) ordered by
    * (group, t). Null entities/periods drop (they identify no lifetime). */
  def curve(events: DataFrame, groupCol: String, entityCol: String,
      periodCol: Column): DataFrame = {
    val lifetimes = events
      .select(col(groupCol).as("g"), col(entityCol).as("__e"),
        periodCol.cast("bigint").as("__p"))
      .where(col("g").isNotNull && col("__e").isNotNull && col("__p").isNotNull)
      .groupBy(col("g"), col("__e"))
      .agg((max(col("__p")) - min(col("__p"))).as("t"))
    val byT = lifetimes.groupBy(col("g"), col("t"))
      .agg(count(lit(1)).as("churned"))
    val wAll = Window.partitionBy(col("g"))
    val wUpto = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      // at risk at t: everyone minus those churned strictly before t
      .withColumn("n_risk",
        sum(col("churned")).over(wAll)
          - sum(col("churned")).over(wUpto) + col("churned"))
      // a zero hazard factor (everyone at risk churns) happens exactly at
      // each group's LAST lifetime — S is 0 there by definition. Keep
      // ln() off the zero EXPLICITLY in both the term and the outer
      // value: Spark nulls ln(0) but DuckDB yields -inf, which a DECIMAL
      // cast rejects — the one spot the engines disagree. The nulled term
      // only affects its own row's sum, and that row is overridden to 0.
      .withColumn("__lnf",
        when(col("churned") === col("n_risk"), lit(null))
          .otherwise(round(log(
            lit(1.0) - col("churned").cast("double") / col("n_risk")), 6)))
      .withColumn("survival",
        when(col("churned") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(
            sum(col("__lnf").cast("decimal(38,6)")).over(wUpto)
              .cast("double")), 6)))
      .select(col("g"), col("t"), col("n_risk"), col("churned"), col("survival"))
      .orderBy(col("g"), col("t"))
  }
}
