package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates — the feature-store freshness
  * primitive: "this user's activity score, where yesterday counts double
  * what the day before does". Each observation weighs
  * `0.5 ^ (age / halfLife)`; the decayed sum and count per key summarize
  * an unbounded history into one number that recent events dominate.
  *
  * Scale shape: ONE grouped aggregate — the weight is per-row map-side
  * arithmetic (age from the reference instant, one `exp`), partials
  * combine map-side, the shuffle carries one buffer per key per
  * partition. Nothing re-scans history per query; refreshing to a new
  * `asOf` is a constant rescale `0.5^(Δ/halfLife)` of the stored sums —
  * the same mergeable-state algebra as the incremental aggregates
  * (decayed sums add across batches AND rescale in O(1)).
  *
  * Cross-engine reproducibility: ages are integer nano differences
  * divided in DOUBLE, each row's weight `exp(ln(0.5)·age/halfLife)`
  * rounds to 9 (libm-parity rule) before entering a DECIMAL sum —
  * order-independent, bit-identical in any engine.
  */
object Decay {

  /** Per-key (`n`, `decayed_sum`, `decayed_n`) as of `asOfNs`:
    * `decayed_sum` = Σ w·value (null values contribute nothing),
    * `decayed_n` = Σ w, `n` the raw included count. Rows after `asOf`
    * are excluded — a feature snapshot sees only its past; null
    * timestamps drop (no age, no weight). */
  def decayedStats(df: DataFrame, keyCol: String, tsNsCol: Column,
      valCol: String, halfLifeDays: Double, asOfNs: Long): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val ageDays = (lit(asOfNs) - tsNsCol).cast("double") / lit(86400e9)
    val w = round(exp(lit(math.log(0.5)) * ageDays / lit(halfLifeDays)), 9)
    df.where(tsNsCol.isNotNull && tsNsCol <= asOfNs)
      .select(col(keyCol), w.as("__w"), col(valCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        // per-term round-9 in DOUBLE before the decimal cast (the BM25
        // rule), and round-6 OUTPUTS: a double round at the 9th place
        // can still disagree by one ulp at a half boundary — the
        // output rounding absorbs it
        round(sum(round(col("__w") * col(valCol), 9).cast("decimal(38,9)"))
          .cast("double"), 6).as("decayed_sum"),
        round(sum(col("__w").cast("decimal(38,9)")).cast("double"), 6)
          .as("decayed_n"))
  }
}
