package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Large-scale deduplication operators over a document corpus — the
  * training-data-pipeline extension surface (build brief): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Everything is expression-level (no Scala/Python UDFs) and
  * shuffle-disciplined: candidate generation is always a bucket join
  * (shuffle on a band/bucket key), never an O(n²) cross join — the property
  * that keeps these runnable on a 100 TB corpus.
  */
object Dedup {

  // ───────────────────────────── exact ─────────────────────────────

  /** Exact dedup on a content key: hash-partition by the key, keep the
    * first row by `tieBreaker` — deterministic, unlike a bare
    * dropDuplicates. One shuffle on the key. */
  def exactByKey(df: DataFrame, key: Column, tieBreaker: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tieBreaker)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate groups: content hash → sorted ids sharing it (n > 1). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  // ─────────────────────────── shingling ───────────────────────────

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles, first-occurrence order; texts shorter
    * than `n` words collapse to a single whole-text shingle. Fused native
    * expression — see [[graft.functions.TextSketches.wordShingles]]. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextSketches.shingles(text, n)

  // ──────────────────────── MinHash + LSH ────────────────────────

  /** k-permutation MinHash signature of a shingle array: for seed i,
    * min over shingles of xxhash64(shingle, seed=i). Fused native
    * expression — the equivalent higher-order-function formulation walks
    * the shingle array k times through interpreted lambdas (measured 200×
    * slower at sf0.1; see [[graft.functions.TextSketches]]). */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    graft.functions.TextSketches.minhashSig(shingleArr, k)

  /** LSH banding: split a k-length signature into `bands` bands of
    * k/bands rows and hash each band (band index salts the hash).
    * One row per (id, band_idx, band_hash). */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, k: Int,
      bands: Int): DataFrame = {
    require(k % bands == 0, s"signature length $k not divisible into $bands bands")
    val r = k / bands
    df.select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col(sigCol), b * lit(r) + lit(1), lit(r)))))
      .as(Seq("band_idx", "band_hash")))
  }

  /** Candidate pairs from LSH buckets: self-join on (band_idx, band_hash),
    * id1 < id2, distinct. The join key is the bucket — no cross join. */
  def lshCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("id1"))
    val b = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("id2"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    * bucket-join candidates → exact-Jaccard verify on the shingle sets →
    * pairs with jaccard ≥ threshold. Verification joins only candidate ids
    * back to shingles, so exact set comparison touches candidates, not n². */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val shingled = df.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    val sig = shingled.select(col(idCol), minhashSignature(col("sh"), k).as("sig"))
    val candidates = lshCandidates(lshBands(sig, idCol, "sig", k, bands), idCol)
    ngramJaccardOnShingles(candidates, shingled, idCol)
      .filter(col("jaccard") >= threshold)
  }

  // ───────────────────────── SimHash ─────────────────────────

  /** Adds a 64-bit SimHash fingerprint column: per bit j, sum ±1 over the
    * token hashes; bit j is set when the sum is positive. Fused native
    * expression (the SQL-lambda formulation re-walks the hash array 64
    * times; see [[graft.functions.TextSketches]]). */
  def withSimhash(df: DataFrame, textCol: String, out: String = "fp"): DataFrame =
    df.withColumn(out, graft.functions.TextSketches.simhash(tokens(col(textCol))))

  /** Hamming distance between two 64-bit fingerprint columns. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: fingerprint, band the 64 bits into 4×16-bit chunks
    * (within Hamming distance 3 at least one chunk matches exactly —
    * pigeonhole), bucket-join on chunks, verify by Hamming distance. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = withSimhash(df.select(col(idCol), col(textCol)), textCol)
    val chunks = fp.select(col(idCol), col("fp"), posexplode(expr(
        "transform(sequence(0, 3), c -> (fp >> (c * 16)) & 65535)"))
      .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col(idCol).as("id1"), col("fp").as("fp1"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col(idCol).as("id2"), col("fp").as("fp2"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        hammingDistance(col("fp1"), col("fp2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ─────────────────── n-gram Jaccard verify ───────────────────

  /** Exact n-gram Jaccard for given candidate pairs (the verify stage the
    * sketch methods share). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame =
    ngramJaccardOnShingles(pairs,
      docs.select(col(idCol), shingles(col(textCol), n).as("sh")), idCol)

  private def ngramJaccardOnShingles(pairs: DataFrame, shingled: DataFrame,
      idCol: String): DataFrame =
    pairs
      .join(shingled.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(shingled.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2")))).as("jaccard"))

  // ───────────────── embedding-cosine near-dup ─────────────────

  /** Near-duplicates by embedding cosine ≥ threshold: random-hyperplane
    * buckets (see [[Similarity.hyperplaneBuckets]]) make pair generation a
    * bucket join; candidates are distinct'd on ids before the exact cosine
    * verify with the fused native expression. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = Similarity.hyperplaneBuckets(df, vecCol, planes, seed)
    val a = bucketed.select(col("bucket"), col(idCol).as("id1"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id2"))
    val candidates = a.join(b, "bucket")
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
    val vecs = df.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(vecs.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .select(col("id1"), col("id2"),
        VectorExprs.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
