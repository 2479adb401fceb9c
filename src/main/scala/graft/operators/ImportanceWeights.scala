package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling")
  * — the pretraining-pipeline step that scores a raw web-scale corpus by
  * how target-like each document is, using hashed n-gram bag-of-words
  * models of a (small) target corpus vs the raw corpus itself.
  *
  * Model: unigrams hash into `buckets` buckets; each side gets an add-k
  * smoothed categorical distribution over buckets; a document's score is
  * the log importance ratio
  *
  *   log w(d) = Σ_{token t ∈ d} ln( p_target(b(t)) / p_raw(b(t)) )
  *
  * Selection then keeps the top-scoring documents (or Gumbel-resamples
  * by weight); this operator emits the per-document scores — the
  * selection itself is an `ORDER BY ... LIMIT` / threshold filter.
  *
  * Scale shape: both distributions are ONE bucket-keyed count aggregate
  * (the bucket table is `buckets` rows — broadcast); per-document
  * scoring pre-aggregates tokens to (doc, bucket) occurrence counts so
  * the ratio join touches distinct buckets per doc, not occurrences; the
  * two 1-row token totals attach as broadcast scalars. The raw corpus is
  * scanned twice (distribution + scoring) — cache or persist the token
  * projection when the pipeline allows. Nothing shuffles wider than
  * (doc, bucket).
  *
  * Cross-engine reproducibility: bucket ids come from the md5-prefix
  * integer idiom shared with the repo's oracle twins; each bucket's
  * `n·ln ratio` term rounds to 9 and accumulates as DECIMAL(38,12)
  * (order-invariant); the final score rounds to 6.
  */
object ImportanceWeights {

  /** md5-based token bucket in [0, buckets) — engine-portable (DuckDB:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT % buckets`). */
  def tokenBucket(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 15), 16, 10).cast("long"), lit(buckets))

  private def tokens(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(split(trim(col(textCol)), "\\s+")).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("__doc"), tokenBucket(col("__t"), buckets).as("__b"))

  /** Per-document DSIR log importance ratios of `raw` against `target`.
    * Returns (`idCol`, `n_tokens`, `log_ratio`); documents with no
    * tokens drop out (no evidence either way). Higher = more
    * target-like. `addK` is the add-k smoothing constant applied to both
    * sides' bucket counts.
    */
  def dsirLogRatios(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024, addK: Double = 1.0): DataFrame = {
    require(buckets > 0, s"need a positive bucket count, got $buckets")
    require(addK > 0, s"additive smoothing needs addK > 0, got $addK")
    val rawToks = tokens(raw, idCol, textCol, buckets)
    val tgtToks = tokens(target, idCol, textCol, buckets)

    val rawDist = rawToks.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val tgtDist = tgtToks.groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val rawTotal = rawToks.agg(count(lit(1)).as("__nr"))
    val tgtTotal = tgtToks.agg(count(lit(1)).as("__nt"))

    // λ(b) = ln(p_t(b) / p_r(b)) over the raw-observed buckets (every
    // scored token's bucket is raw-observed by construction); target
    // counts absent from a bucket smooth to addK
    val lambda = rawDist
      .join(tgtDist, Seq("__b"), "left")
      .crossJoin(broadcast(rawTotal))
      .crossJoin(broadcast(tgtTotal))
      .select(col("__b"),
        round(log(
          ((coalesce(col("__ct"), lit(0L)) + lit(addK)) /
            (col("__nt") + lit(addK) * lit(buckets.toDouble))) /
          ((col("__cr") + lit(addK)) /
            (col("__nr") + lit(addK) * lit(buckets.toDouble)))), 9)
          .as("__lam"))

    rawToks.groupBy(col("__doc"), col("__b")).agg(count(lit(1)).as("__n"))
      .join(lambda, "__b") // bucket table ≤ `buckets` rows — broadcasts
      .groupBy(col("__doc").as(idCol))
      .agg(sum(col("__n")).as("n_tokens"),
        round(sum(round(col("__n") * col("__lam"), 9)
          .cast("decimal(38,12)")).cast("double"), 6).as("log_ratio"))
  }
}
