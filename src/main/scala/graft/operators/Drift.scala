package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two samples of a numeric
  * column — the Population Stability Index (PSI), the standard
  * model-monitoring/data-contract signal for "has this feed shifted
  * since the baseline snapshot" (PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted; Siddiqi, *Credit Risk Scorecards*, 2006).
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * over equal-width histogram shares with add-k smoothing (so empty
  * bins never divide by zero and the index stays finite).
  *
  * Scale shape: each side collapses to a `bins`-row histogram in ONE
  * count aggregate ([[Profiling.histogram]] semantics — out-of-range
  * values clamp into the edge buckets); everything after operates on
  * bin-sized tables (spine join + two 1-row total scalars). At 100 TB
  * the cost is exactly two scans with map-side partial counts.
  *
  * Cross-engine reproducibility: bin ids and counts are exact integers;
  * shares and the ln run in DOUBLE from identical integers (identical
  * IEEE ops both engines), each bin's contribution rounds to 9 — sum
  * them as DECIMAL for an order-invariant total.
  */
object Drift {

  /** Per-bin PSI decomposition of `current` against `base`.
    * Returns one row per bin in [0, bins): (`bucket`, `n_base`,
    * `n_curr`, `contrib`), every bin present (zero-count bins carry the
    * smoothing mass — with unequal sample sizes they contribute too).
    * The headline index is the decimal sum of `contrib`. */
  def psiBins(base: DataFrame, current: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int, addK: Double = 0.5): DataFrame = {
    require(bins > 0 && hi > lo, s"bad PSI range [$lo, $hi) / $bins")
    require(addK > 0, s"smoothing needs addK > 0, got $addK")
    def hist(df: DataFrame, as: String) =
      Profiling.histogram(df, valueCol, lo, hi, bins)
        .select(col("bucket"), col("n").as(as))
    def total(df: DataFrame, as: String) =
      df.filter(col(valueCol).isNotNull).agg(count(lit(1)).as(as))
    val spine = base.sparkSession.range(bins)
      .select(col("id").cast("int").as("bucket"))
    val p = (coalesce(col("n_base"), lit(0L)) + lit(addK)) /
      (col("__nb") + lit(addK) * lit(bins.toDouble))
    val q = (coalesce(col("n_curr"), lit(0L)) + lit(addK)) /
      (col("__nc") + lit(addK) * lit(bins.toDouble))
    spine
      .join(hist(base, "n_base"), Seq("bucket"), "left")
      .join(hist(current, "n_curr"), Seq("bucket"), "left")
      .crossJoin(broadcast(total(base, "__nb")))
      .crossJoin(broadcast(total(current, "__nc")))
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"),
        round((p - q) * log(p / q), 9).as("contrib"))
  }
}
