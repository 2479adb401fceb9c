package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Name-based record linkage on Jaro-Winkler similarity — the
  * complement to [[Dedup.fuzzyPairs]]' Levenshtein path: JW is the
  * standard metric for person/company/product NAMES (transpositions
  * cost half a mismatch, shared prefixes are rewarded), where absolute
  * edit distance over-penalizes long strings.
  *
  * Scale shape: candidates come from an equi-join on a blocking key
  * (default: the name's first token + a length bucket — same-entity
  * name variants overwhelmingly share their first word), so the join
  * never goes corpus²; scoring runs the fused codegen
  * [[graft.functions.JaroWinkler]] expression per candidate pair. The
  * within-block candidate set is quadratic in block size — same
  * domain-knowledge contract as fuzzyPairs, so prefer blocking keys
  * with bounded selectivity or pre-cap hot blocks upstream.
  */
object Linkage {

  /** All (id1 < id2) pairs whose names block together and score
    * jw ≥ `threshold`. Output: (id1, id2, jw) with jw rounded to 6. */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      threshold: Double, lengthBucket: Int = 8): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"need 0 < threshold <= 1, got $threshold")
    require(lengthBucket >= 1, s"lengthBucket must be >= 1, got $lengthBucket")
    val keyed = df
      .where(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), col(nameCol).as("__name"),
        split(col(nameCol), " ").getItem(0).as("__b1"),
        (length(col(nameCol)) / lengthBucket).cast("int").as("__b2"))
    val a = keyed.select(col("__id").as("id1"), col("__name").as("__n1"),
      col("__b1"), col("__b2"))
    val b = keyed.select(col("__id").as("id2"), col("__name").as("__n2"),
      col("__b1"), col("__b2"))
    a.join(b, Seq("__b1", "__b2"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(graft.functions.StringSimilarityExprs.jaroWinkler(
          col("__n1"), col("__n2")), 6).as("jw"))
      .where(col("jw") >= threshold)
  }
}
