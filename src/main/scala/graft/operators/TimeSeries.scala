package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and gap-filling over event tables.
  *
  * The reference's data model is batch-only, but any telemetry/metrics
  * corpus at 100 TB needs regularization to a fixed grid before windowed
  * features (the events fixture carries irregular per-user event times).
  * Everything here is expressed per-key:
  *
  *  - bucket assignment is a map-side integer division;
  *  - the per-key grid is generated with `sequence()` off a per-key
  *    min/max aggregate — the spine explode is distributed by key, no
  *    driver-side range materialization;
  *  - forward fill is `last(_, ignoreNulls)` over a key-partitioned
  *    running window — bounded by the key's own rows, never a global sort.
  *
  * At cluster scale the only shuffles are the per-key aggregate and the
  * window partition — both on the series key, both AQE-coalescible.
  */
object TimeSeries {

  /** Resample `df` onto a fixed `bucketWidth` grid per `keyCol` and
    * forward-fill buckets with no observations.
    *
    * `tsCol` must be an integral epoch column (the fixture's nanos-as-long
    * timestamps); `bucketWidth` is in the same unit. Observed buckets carry
    * the exact mean of `valCol` (decimal-accumulated, order-independent);
    * empty buckets take the latest preceding bucket's mean (null until the
    * key's first observed value — there is nothing to fill from).
    *
    * The observed-bucket aggregate feeds BOTH the spine bounds and the
    * fill join — two consumers replaying one shuffle's lineage; pass
    * `materialize` (cache / checkpoint) to compute it once at scale.
    *
    * Output: (key, bucket, n_obs, v_obs, v_filled) — one row per grid cell
    * between the key's first and last observation inclusive.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, bucketWidth: Long,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("__v", "__b0", "__b1"))
    require(clash.isEmpty,
      s"resampleFill reserves column name(s) ${clash.mkString(", ")} — rename them in the input")
    require(keyCol != "bucket" && valCol != "bucket" && tsCol != "bucket",
      "resampleFill emits a `bucket` column — rename the input's `bucket` first")
    // integer division — `/` on longs is DOUBLE division in Spark, and an
    // epoch-nanos value (~1.7e18) exceeds double's 2^53 integer range, so
    // bucket boundaries would shift by rounding
    val bucket = expr(s"`$tsCol` div ${bucketWidth}L")
    val obs = materialize(df
      .select(col(keyCol), bucket.as("bucket"), col(valCol).as("__v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(
        count(col("__v")).as("n_obs"),
        (sum(col("__v").cast("decimal(38,6)")).cast("double") /
          count(col("__v"))).as("v_obs")))
    // per-key grid: one sequence per key spanning its observed range —
    // the explode fans out on the key, so grid generation is distributed
    val spine = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("v_obs"),
        last(col("v_obs"), ignoreNulls = true).over(fill).as("v_filled"))
  }

  /** Rolling z-score anomaly detection per series key — each observation
    * scored against the mean/stddev of its previous `lookback`
    * observations (ROWS frame ending at 1 PRECEDING: the current point
    * never smooths its own baseline). The streaming-telemetry outlier
    * primitive, batch-expressed.
    *
    * Scale shape: ONE key-partitioned window (the same shuffle a running
    * sum needs) computes rolling count/Σv/Σv² in a single pass; the
    * z-score is per-row arithmetic on those three numbers. No global
    * sort, no self-join, state bounded by `lookback` rows per task.
    *
    * Cross-engine reproducibility: the rolling sums accumulate per-term
    * ROUND(v,6) / ROUND(v²,6) as DECIMAL(38,6) (order-invariant, exact);
    * mean and variance derive in DOUBLE from those exact sums via the
    * computational formula `(Σv² − (Σv)²/n) / (n−1)`; `sqrt` is
    * IEEE-exact; the z rounds to 6. Rows with fewer than `minObs`
    * predecessors — or a degenerate (≤ 0, i.e. cancellation-noise)
    * variance — get a null z and are never flagged.
    *
    * Output: input key/order columns + (`n_prev`, `z`, `is_anomaly`).
    */
  def rollingAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, lookback: Int = 10,
      zThresh: Double = 3.0, minObs: Int = 4): DataFrame = {
    require(lookback >= minObs && minObs >= 2,
      s"need lookback >= minObs >= 2, got lookback=$lookback minObs=$minObs")
    val clash = df.columns.toSet
      .intersect(Set("__n", "__s1", "__s2", "n_prev", "z", "is_anomaly"))
    require(clash.isEmpty,
      s"rollingAnomaly reserves column name(s) ${clash.mkString(", ")} — rename them in the input")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val v = col(valCol)
    val withSums = df.select(col(keyCol), col(tsCol), col(tieCol), v,
      count(v).over(w).as("__n"),
      sum(round(v, 6).cast("decimal(38,6)")).over(w).cast("double").as("__s1"),
      sum(round(v * v, 6).cast("decimal(38,6)")).over(w).cast("double").as("__s2"))
    val mean = col("__s1") / col("__n")
    val variance = (col("__s2") - col("__s1") * col("__s1") / col("__n")) /
      (col("__n") - lit(1))
    val z = when(col("__n") >= minObs && variance > 0,
      round((v - mean) / sqrt(variance), 6))
    withSums.select(col(keyCol), col(tsCol), col(tieCol), v,
      col("__n").as("n_prev"), z.as("z"),
      coalesce(abs(z) > zThresh, lit(false)).as("is_anomaly"))
  }

  /** Per-key time-weighted average — each observation weighted by how
    * long it remained current (until the key's next observation): the
    * billing/position/telemetry mean for irregular series, where the
    * arithmetic mean over-weights chatty periods.
    *
    *   TWAP = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ)
    *
    * The key's LAST observation has no holding interval and drops out
    * (a caller wanting a closing horizon appends a sentinel row).
    *
    * Scale shape: one key-partitioned lead window (the sessionization
    * shuffle) + one per-key aggregate. `tsCol` must be integral epoch
    * units; weighted terms round to 6 into DECIMAL sums and the final
    * division runs in DOUBLE.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(valCol),
        (lead(col(tsCol), 1).over(w) - col(tsCol)).as("__dur"))
      .where(col("__dur").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).as("total_span"),
        round(
          sum(round(col(valCol) * col("__dur"), 6).cast("decimal(38,6)"))
            .cast("double") /
          sum(col("__dur")).cast("double"), 6).as("twap"))
  }
}
