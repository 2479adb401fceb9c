package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal — the C4/RefinedWeb "drop any line
  * that occurs in ≥ N documents" pass (navigation chrome, license
  * headers, cookie banners), expressed segment-wise: documents split
  * into non-overlapping `segTokens`-token segments (the fixture has no
  * newlines; for a corpus with real lines, pre-split on `\n` and the
  * same census applies verbatim), a corpus-wide census counts how many
  * DISTINCT documents each exact segment appears in, and segments at or
  * above the `minDocs` threshold are removed before the document is
  * reassembled in original order.
  *
  * Scale shape (100 TB-safe): segment construction is pure map-side
  * expression math (the fused [[graft.functions.ChunkSegments]] — one
  * output row per segment, never per token, WholeStageCodegen); the census is one
  * segment-keyed aggregate with map-side partial distinct; membership is
  * a segment-keyed equi-join; reassembly is one doc-keyed aggregate
  * whose ordered concat uses `sort_array(collect_list(struct(idx, seg)))`
  * — deterministic under any shuffle order. Nothing quadratic, nothing
  * single-partition; every shuffle key (segment hash, doc id) is
  * naturally high-cardinality.
  *
  * Doc-distinct (not raw occurrence) counting makes the criterion
  * robust to a single spammy document repeating its own segment.
  *
  * Output: (idCol, clean_text, n_kept, n_dropped) — `clean_text` is ''
  * (not null) when every segment was boilerplate. Documents with
  * whitespace-only text are not emitted (the corpus-text convention of
  * the simhash/fingerprint family). */
object Boilerplate {

  def removeRepeatedSegments(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 3, minDocs: Int = 3): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = split(trim(col(textCol)), "\\s+")
    // segment construction and reassembly are FUSED expressions
    // (ChunkSegments / StructFieldJoin) — the transform(sequence(...))
    // and array_join(transform(...)) HOF chains they replace are
    // CodegenFallback, and segment construction is the per-token hot
    // loop of the whole pass (parity spec: WordNGramsFusedSpec)
    val segs = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(graft.functions.ChunkSegments.column(toks, segTokens, " ")))
      .withColumnRenamed("pos", "__idx")
      .withColumnRenamed("col", "__seg")
    val census = segs.groupBy("__seg")
      .agg(countDistinct(col(idCol)).as("__ndocs"))
    segs.join(census, "__seg")
      .groupBy(col(idCol))
      .agg(
        graft.functions.StructFieldJoin.column(
          sort_array(collect_list(when(col("__ndocs") < minDocs,
            struct(col("__idx"), col("__seg"))))),
          "__seg", " ").as("clean_text"),
        count(when(col("__ndocs") < minDocs, lit(1))).as("n_kept"),
        count(when(col("__ndocs") >= minDocs, lit(1))).as("n_dropped"))
  }
}
