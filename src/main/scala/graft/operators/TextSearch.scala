package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus — BM25, the ranking
  * function behind Lucene/Elasticsearch — expressed as an inverted-index
  * aggregation (training-data-pipeline extension surface; the reference
  * is a flight-ML app with no text search).
  *
  * Scale shape: the corpus is scanned ONCE; non-query tokens are dropped
  * map-side BEFORE any shuffle (an IN-list over the handful of query
  * terms), so the only aggregations that shuffle are keyed by
  * (doc, term) over matching docs only. Per-term document frequencies
  * and the corpus stats are single-row/handful-row broadcasts. The final
  * top-k is `orderBy(score).limit(k)` — TakeOrderedAndProject, a per-
  * partition bounded heap, never a global sort.
  */
object TextSearch {

  /** Top-`k` documents for `queryTerms` under BM25 (Robertson/Sparck
    * Jones idf, k1/b saturation):
    *
    *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Tokenization is whitespace (the corpus convention shared with
    * [[SparseSimilarity]] / [[TextAnalysis.vocabulary]]); `dl` is the
    * [[TextAnalysis.wsTokenCount]] length and `avgdl` its corpus mean.
    * Documents containing none of the query terms do not appear (their
    * score is 0). Cross-engine reproducibility: idf and avgdl round to 6
    * places (libm parity), per-term contributions round to 9 then
    * accumulate as DECIMAL (order-independent), final score rounds to 6;
    * ties break by id ascending.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one query term")
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("__text"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("double").as("dl"))
    // corpus stats: one row, broadcast; avgdl decimal-accumulated then
    // rounded so both engines agree to the digit
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      // decimal SUM for order-independence, then the division in DOUBLE
      // (decimal division scales differently per engine), then round
      round(sum(col("dl").cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double"), 6).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(split(trim(col("__text")), "\\s+")).as("word"))
      .filter(col("word").isin(queryTerms: _*)) // map-side, pre-shuffle
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(log(
        lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      // (k1 + 1) as an in-plan ADD, not a Scala-side constant: a driver-
      // computed `lit(k1+1)` can round differently than the oracle's
      // literal; both engines performing the identical IEEE add agree
      .withColumn("__c", round(
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
        9))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__c").cast("decimal(38,12)")).cast("double"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact phrase search over the positional index: documents containing
    * `phrase`'s tokens CONSECUTIVELY, with the occurrence count — the
    * quoted-query complement to [[bm25Search]]'s bag-of-words ranking.
    *
    * Scale shape: the posexplode keeps only the phrase's own tokens
    * map-side (the bm25 prune), so the position join chains — one
    * equi-join per additional phrase word, keyed on (doc, position) —
    * run over matching postings only, never the full index. A w-word
    * phrase is w−1 joins; real phrase queries are short.
    *
    * Output: (idCol, n_occurrences) for documents with ≥ 1 match. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    require(words.size >= 2, s"phrase needs >= 2 words, got '$phrase'")
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "__pos", "__tok")
      .where(col("__tok").isin(words.distinct: _*))
    val first = toks.where(col("__tok") === words.head)
      .select(col(idCol), col("__pos").as("__p0"))
    val matched = words.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(
          toks.where(col("__tok") === w)
            .select(col(idCol), (col("__pos") - i).as("__p0")),
          Seq(idCol, "__p0"))
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }
}
