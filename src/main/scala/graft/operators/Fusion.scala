package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (training-data-pipeline extension
  * surface; the reference is a flight-ML app with no retrieval stack).
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09) combines
  * ranked lists from heterogeneous retrievers — here the repo's lexical
  * side ([[TextSearch.bm25Search]]) and semantic side
  * ([[Similarity.bruteForceTopK]] / [[Similarity.ivfTopK]]) — without
  * score calibration: each list contributes `1 / (k + rank)` and the
  * fused score is the sum, so a document surfacing near the top of ANY
  * list rises regardless of incomparable score scales.
  *
  * Scale shape: inputs are top-k RESULT LISTS, not corpora — each is
  * bounded at its retriever's `k` (tens of rows) by construction, so the
  * global rank window here runs over k rows per list, never over data.
  * The heavy lifting (scanning 100 TB of documents/vectors) already
  * happened inside the retrievers, which keep their own scale shapes
  * (inverted-index aggregation, bucket-pruned ANN). Fusing L lists of k
  * rows is an O(L·k) union + one tiny aggregate.
  *
  * Cross-engine reproducibility: ranks are integers (ties broken by id
  * ascending); `1/(k+rank)` is rounded to 9 places and accumulated as
  * DECIMAL(38,12) (order-invariant), the fused score rounds to 6.
  */
object Fusion {

  /** Fuse ranked lists into one top-`topK` list by RRF.
    *
    * Each input list must expose `idCol` and `scoreCol` (higher = more
    * relevant); rank within a list is `row_number` over
    * (score desc, id asc). Returns (`idCol`, `n_lists`, `rrf_score`)
    * ordered by (rrf_score desc, id asc), limited to `topK`.
    */
  def reciprocalRankFusion(lists: Seq[DataFrame], idCol: String,
      scoreCol: String, kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "reciprocalRankFusion needs at least one list")
    require(kRrf > 0, s"RRF constant must be positive, got $kRrf")
    // rank each bounded list; the empty-partition window is deliberate —
    // see the scale-shape note above (inputs are k-row result lists)
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val ranked = lists.map(_
      .select(col(idCol), col(scoreCol))
      .withColumn("__rank", row_number().over(w))
      .select(col(idCol),
        round(lit(1.0) / (lit(kRrf) + col("__rank")), 9)
          .cast("decimal(38,12)").as("__c")))
    ranked.reduce(_.unionAll(_))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        round(sum(col("__c")).cast("double"), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }
}
