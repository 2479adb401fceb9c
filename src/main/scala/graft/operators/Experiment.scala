package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Inverse-propensity-weighted ATE over DISCRETE confounder strata —
    * the observational-data effect estimate CUPED can't give (CUPED
    * needs randomization; IPW corrects for measured confounding).
    * With per-stratum propensities e(x) = n₁ₓ/nₓ the IPW sums collapse
    * algebraically to stratum aggregates (Σ_{T=1,x} y/e = s₁ₓ·nₓ/n₁ₓ),
    * so the whole estimator is one stratum-keyed aggregate + a
    * stratum-panel reduce — no per-row weights ever materialize.
    * Strata with a missing arm (positivity violation) are excluded
    * and counted. Effective sample sizes are the (Σw)²/Σw²
    * diagnostic, also in closed form from counts.
    *
    * Parity: outcome sums are round-6 decimal; per-stratum IPW terms
    * are round-9 decimal; final forms divide in fixed-order DOUBLE,
    * outputs round 6.
    *
    * Output: one row (n_used, n_excluded_strata, naive_diff, ate,
    * ess_treated, ess_control). */
  def ipwAte(df: DataFrame, treatCol: String, outcomeCol: String,
      strataCol: String): DataFrame = {
    val d6 = "decimal(38,6)"
    val d9 = "decimal(38,9)"
    val t = col(treatCol).cast("boolean")
    val y = col(outcomeCol)
    val strata = df.where(y.isNotNull && t.isNotNull)
      .groupBy(col(strataCol).as("__x"))
      .agg(count(lit(1)).as("__n"),
        sum(when(t, 1L).otherwise(0L)).as("__n1"),
        sum(when(t, round(y, 6)).otherwise(lit(0)).cast(d6)).as("__s1"),
        sum(when(!t, round(y, 6)).otherwise(lit(0)).cast(d6)).as("__s0"))
    val ok = col("__n1") > 0 && col("__n1") < col("__n")
    val nD = col("__n").cast("double")
    val n1D = col("__n1").cast("double")
    val n0D = (col("__n") - col("__n1")).cast("double")
    val agg = strata.agg(
      sum(when(ok, col("__n")).otherwise(lit(0L))).as("__nu"),
      sum(when(!ok, 1L).otherwise(0L)).as("__nex"),
      // IPW arm totals: Σ_x s1·n/n1 and Σ_x s0·n/n0 (round-9 decimal)
      sum(when(ok, round(col("__s1").cast("double") * nD / n1D, 9))
        .otherwise(lit(0)).cast(d9)).as("__w1"),
      sum(when(ok, round(col("__s0").cast("double") * nD / n0D, 9))
        .otherwise(lit(0)).cast(d9)).as("__w0"),
      // naive diff ingredients over the SAME used strata
      sum(when(ok, col("__n1")).otherwise(lit(0L))).as("__tn1"),
      sum(when(ok, col("__s1")).otherwise(lit(0)).cast(d6)).as("__ts1"),
      sum(when(ok, col("__s0")).otherwise(lit(0)).cast(d6)).as("__ts0"),
      // ESS denominators: Σ_x n²/n1 and Σ_x n²/n0 (round-9 decimal)
      sum(when(ok, round(nD * nD / n1D, 9)).otherwise(lit(0)).cast(d9))
        .as("__e1"),
      sum(when(ok, round(nD * nD / n0D, 9)).otherwise(lit(0)).cast(d9))
        .as("__e0"))
    val nu = col("__nu").cast("double")
    agg.select(col("__nu").cast("bigint").as("n_used"),
      col("__nex").cast("bigint").as("n_excluded_strata"),
      round(col("__ts1").cast("double") / col("__tn1").cast("double") -
        col("__ts0").cast("double") /
          (col("__nu") - col("__tn1")).cast("double"), 6).as("naive_diff"),
      round((col("__w1").cast("double") - col("__w0").cast("double")) / nu,
        6).as("ate"),
      round(nu * nu / col("__e1").cast("double"), 6).as("ess_treated"),
      round(nu * nu / col("__e0").cast("double"), 6).as("ess_control"))
  }

  /** Two-by-two difference-in-differences: the treated group's
    * pre→post outcome change net of the control group's — the
    * parallel-trends effect estimate for staggered rollouts. One
    * (group, period) cell aggregate (decimal outcome sums, exact
    * counts), one 4-cell reduce; the estimate is fixed-order IEEE on
    * the four cell means, rounded 6.
    *
    * Output: one row (n, mean_c_pre, mean_c_post, mean_t_pre,
    * mean_t_post, did). */
  def diffInDiffs(df: DataFrame, treatCol: String, postCol: String,
      outcomeCol: String): DataFrame = {
    val d6 = "decimal(38,6)"
    val t = col(treatCol).cast("boolean")
    val p = col(postCol).cast("boolean")
    val y = col(outcomeCol)
    val cells = df.where(y.isNotNull && t.isNotNull && p.isNotNull)
      .groupBy(t.as("__t"), p.as("__p"))
      .agg(count(lit(1)).as("__n"), sum(round(y, 6).cast(d6)).as("__s"))
    def mean(tv: Boolean, pv: Boolean): Column =
      max(when(col("__t") === tv && col("__p") === pv,
        col("__s").cast("double") / col("__n").cast("double")))
    val agg = cells.agg(sum(col("__n")).as("__nn"),
      count(lit(1)).as("__cells"),
      mean(false, false).as("__cpre"), mean(false, true).as("__cpost"),
      mean(true, false).as("__tpre"), mean(true, true).as("__tpost"))
    // an empty (group, period) cell would propagate null through the
    // estimate silently — fail loudly like the other degenerate edges
    // (markovRemovalEffects, zero-effect attribution). The guard rides
    // INSIDE the returned plan (assert_true is null on success, so the
    // coalesce(+0) is a no-op) — no second pass over the input.
    val guard = coalesce(assert_true(col("__cells") === 4,
      lit("diffInDiffs: need all 4 (treat, post) cells non-empty"))
      .cast("bigint"), lit(0L))
    agg.select((col("__nn") + guard).cast("bigint").as("n"),
      round(col("__cpre"), 6).as("mean_c_pre"),
      round(col("__cpost"), 6).as("mean_c_post"),
      round(col("__tpre"), 6).as("mean_t_pre"),
      round(col("__tpost"), 6).as("mean_t_post"),
      round((col("__tpost") - col("__tpre")) -
        (col("__cpost") - col("__cpre")), 6).as("did"))
  }

  /** Always-valid sequential test (mixture SPRT) — the "peeking-safe"
    * A/B readout an experimentation platform publishes per period
    * instead of a fixed-horizon t-test (continuous monitoring with a
    * classical p-value inflates false positives; the mSPRT's rejection
    * rule is valid at EVERY look simultaneously — Johari et al.,
    * "Peeking at A/B Tests", KDD'17).
    *
    * Per cumulative period n with treatment/control means and sample
    * variances, `Vn = s²_t/n_t + s²_c/n_c` and the H0: Δ=0 vs a
    * N(0, τ²) effect mixture gives
    *
    *   ln Λ_n = ½·ln(Vn/(Vn+τ²)) + Δ̄n²·τ² / (2·Vn·(Vn+τ²)),
    *
    * reject when the RUNNING MAX of ln Λ crosses ln(1/α) (the running
    * max is the always-valid envelope: p_n = min_m 1/Λ_m).
    *
    * Scale shape: ONE (variant, period) keyed aggregate is the only
    * pass over data; cumulative sums and the running max are windows
    * over the calendar-bounded period PANEL (≤ dozens of rows — the
    * q_t_backtest shape), not over rows. Periods with fewer than 2
    * observations in either arm (or zero variance) yield null ln Λ and
    * never reject.
    *
    * Cross-engine parity: per-term round-6 metric into DECIMAL sums;
    * means/variances divide in DOUBLE; τ², α are shared literals; only
    * `ln` is libm and the round-6 outputs absorb its ulp.
    *
    * Output per period (ordered): `period`, `n_t`, `n_c`, `delta`,
    * `ln_lambda`, `ln_lambda_max`, `reject`. */
  def msprt(df: DataFrame, treatCol: String, periodCol: String,
      metricCol: String, tauSq: Double, alpha: Double): DataFrame = {
    require(tauSq > 0, s"tauSq must be positive, got $tauSq")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val d6 = "decimal(38,6)"
    val tr = col(treatCol).cast("boolean")
    val y = col(metricCol)
    // one keyed aggregate over data: per (period, arm) count / Σy / Σy²
    val cells = df.where(y.isNotNull && tr.isNotNull)
      .groupBy(col(periodCol).as("period"))
      .agg(
        sum(when(tr, 1L).otherwise(0L)).as("__nt"),
        sum(when(!tr, 1L).otherwise(0L)).as("__nc"),
        sum(when(tr, round(y, 6)).otherwise(lit(0)).cast(d6)).as("__st"),
        sum(when(!tr, round(y, 6)).otherwise(lit(0)).cast(d6)).as("__sc"),
        sum(when(tr, round(y, 6) * round(y, 6)).otherwise(lit(0)).cast(d6))
          .as("__qt"),
        sum(when(!tr, round(y, 6) * round(y, 6)).otherwise(lit(0)).cast(d6))
          .as("__qc"))
    // cumulative panel windows (bounded by the calendar, not the data)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("period"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = cells.select(col("period"),
      sum(col("__nt")).over(w).as("nt"),
      sum(col("__nc")).over(w).as("nc"),
      sum(col("__st")).over(w).cast("double").as("st"),
      sum(col("__sc")).over(w).cast("double").as("sc"),
      sum(col("__qt")).over(w).cast("double").as("qt"),
      sum(col("__qc")).over(w).cast("double").as("qc"))
    val nt = col("nt").cast("double"); val nc = col("nc").cast("double")
    val vart = (col("qt") - col("st") * col("st") / nt) / (nt - lit(1.0))
    val varc = (col("qc") - col("sc") * col("sc") / nc) / (nc - lit(1.0))
    // guarded: an empty arm must yield null delta, not an ANSI
    // divide-by-zero (the whole formula chain rides inside when-guards
    // so no division ever evaluates on a degenerate cumulative row)
    val dd = when(col("nt") >= 1 && col("nc") >= 1,
      col("st") / nt - col("sc") / nc)
    val vn = vart / nt + varc / nc
    val lnLam = when(col("nt") >= 2 && col("nc") >= 2 && vn > 0,
      lit(0.5) * log(vn / (vn + lit(tauSq))) +
        dd * dd * lit(tauSq) / (lit(2.0) * vn * (vn + lit(tauSq))))
    val scored = cum.select(col("period"), col("nt").as("n_t"),
      col("nc").as("n_c"), round(dd, 6).as("delta"), lnLam.as("__ll"))
    val wMax = org.apache.spark.sql.expressions.Window
      .orderBy(col("period"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // reject compares ROUND-6 quantities on BOTH sides: the envelope and
    // the threshold each pass through a libm ln, and a draw landing
    // within an ulp of the boundary would flip the boolean cross-engine
    // — the one output rounding cannot absorb after the fact (round-6
    // ulp-absorption discipline, applied BEFORE the comparison here)
    scored.select(col("period"), col("n_t"), col("n_c"), col("delta"),
      round(col("__ll"), 6).as("ln_lambda"),
      round(max(col("__ll")).over(wMax), 6).as("ln_lambda_max"),
      coalesce(round(max(col("__ll")).over(wMax), 6) >=
        round(-log(lit(alpha)), 6), lit(false))
        .as("reject"))
  }
}
