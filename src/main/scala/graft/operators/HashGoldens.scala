package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Golden oracles for the native xxhash64 sketch paths.
  *
  * The md5 formulations of the sketch family are DuckDB-oracled, but the
  * PRODUCTION paths hash with xxhash64 — engine-specific, so those gates
  * were rows-only. This closes them the way the multimodal gate was
  * closed: a small PLANTED deterministic corpus (independent of the
  * scale-factor fixtures) plus an INDEPENDENT driver-side computation of
  * each sketch — plain Scala over `String`/`Array` using only the shared
  * `XXH64` primitive, no Catalyst, no `UTF8String`, no `ArrayData` —
  * inlined as a VALUES oracle. A regression anywhere in the engine-side
  * plumbing (tokenization, shingling, banding, min-k selection, anchor
  * masking, aggregation) lands on different values than the golden and
  * is hash-visible; only the XXH64 arithmetic itself is common to both
  * sides, and that is pinned upstream by Spark's own test surface.
  *
  * Everything here is integer-exact — no float-parity concerns.
  */
object HashGoldens {

  // ────────────────────── planted corpus ──────────────────────

  /** A passage long enough to carry several content-defined anchors
    * (~1/16 of positions at maskBits=4), shared verbatim by docs
    * 100-103 at different byte offsets — the shift-robustness CDC
    * exists to catch. */
  private val sharedPassage: String = {
    val rnd = new scala.util.Random(777L)
    Seq.fill(40)("p" + rnd.nextInt(100)).mkString(" ")
  }

  /** 109 deterministic docs: 100 random word docs, 4 sharing
    * [[sharedPassage]] at different offsets, an exact duplicate, a
    * one-token near-duplicate, a sub-shingle-length text, an empty
    * text, and a repeated-token text (shingle distinctness). */
  val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260813L)
    val base = (0 until 100).map { i =>
      val len = 12 + rnd.nextInt(48)
      (i.toLong, Seq.fill(len)("w" + rnd.nextInt(400)).mkString(" "))
    }
    val carriers = (0 until 4).map { j =>
      val prefix = Seq.fill(3 + 5 * j)("q" + rnd.nextInt(50)).mkString(" ")
      val suffix = Seq.fill(4)("r" + rnd.nextInt(50)).mkString(" ")
      (100L + j, s"$prefix $sharedPassage $suffix")
    }
    base ++ carriers ++ Seq(
      (104L, base.head._2),                       // exact duplicate of doc 0
      (105L, {                                    // near-duplicate of doc 1
        val t = base(1)._2.split(" "); t(t.length / 2) = "CHANGED"
        t.mkString(" ")
      }),
      (106L, "one two"),                          // < 3 tokens: whole-text shingle
      (107L, ""),                                 // empty text
      (108L, "zzz zzz zzz zzz zzz")               // repeated shingles collapse
    )
  }

  def corpusDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  // ──────────── independent plain-Scala sketch pipeline ────────────

  private def xxStr(s: String, seed: Long): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  private def toks(t: String): Array[String] = t.trim.split("\\s+")

  /** Mirror of the engine's shingle contract: distinct word n-grams in
    * first-occurrence order; < n tokens → one whole-text shingle;
    * empty/blank → one empty shingle. */
  private def shingleGold(t: String, n: Int): Seq[String] = {
    val tk = toks(t)
    if (tk.isEmpty || (tk.length == 1 && tk(0).isEmpty)) Seq("")
    else if (tk.length < n) Seq(tk.mkString(" "))
    else tk.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  /** SimHash64: ±1 votes per bit over token hashes (seed 42). */
  def simhashGold(t: String): Long = {
    val votes = new Array[Int](64)
    toks(t).foreach { w =>
      val h = xxStr(w, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
  }

  /** Winnow sketch: `keep` smallest DISTINCT shingle hashes (seed 7),
    * ascending. */
  def minKGold(t: String, n: Int = 3, keep: Int = 8): Seq[Long] =
    shingleGold(t, n).map(xxStr(_, 7L)).distinct.sorted.take(keep)

  /** xxhash64 of an array<long> column value: seed-42 fold of
    * `XXH64.hashLong` over the elements — the Catalyst `XxHash64`
    * chaining rule. */
  private def xxLongArray(xs: Seq[Long], seed: Long = 42L): Long =
    xs.foldLeft(seed)((acc, v) => XXH64.hashLong(v, acc))

  /** fingerprint64: xxhash64 roll-up of the winnow sketch. */
  def fingerprint64Gold(t: String): Long = xxLongArray(minKGold(t))

  /** k-seed MinHash signature of the shingle set. */
  def minhashGold(t: String, n: Int = 3, k: Int = 32): Seq[Long] = {
    val hs = shingleGold(t, n)
    (0 until k).map(seed => hs.map(xxStr(_, seed.toLong)).min)
  }

  /** LSH band hashes: per band b, xxhash64(b, sig[b·r … b·r+r)) — the
    * int child then each long element fold into the seed-42 chain. */
  def bandsGold(t: String, n: Int = 3, k: Int = 32, bands: Int = 8): Seq[(Int, Long)] = {
    val sig = minhashGold(t, n, k)
    val r = k / bands
    (0 until bands).map { b =>
      val h0 = XXH64.hashInt(b, 42L)
      (b, sig.slice(b * r, b * r + r).foldLeft(h0)((acc, v) => XXH64.hashLong(v, acc)))
    }
  }

  /** Content-defined span hashes over the text BYTES: positions whose
    * gram-context hash (seed 7) lands in the mask band emit the
    * window hash (seed 11). */
  def cdcGold(t: String, window: Int = 40, gram: Int = 8, maskBits: Int = 4): Seq[Long] = {
    val b = t.getBytes(StandardCharsets.UTF_8)
    if (b.length < window) Seq.empty
    else {
      val mask = (1L << maskBits) - 1L
      (0 to b.length - window).flatMap { p =>
        if ((XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + p, gram, 7L) & mask) == 0L)
          Some(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + p, window, 11L))
        else None
      }
    }
  }

  // ───────────────────── VALUES oracles ─────────────────────

  /** (doc_id, fp) VALUES oracle for the planted-corpus SimHash gate. */
  def simhashOracleSql: String = valuesSql(
    corpus.map { case (id, t) => s"($id, ${simhashGold(t)})" },
    Seq("doc_id" -> "BIGINT", "fp" -> "BIGINT"), "doc_id")

  /** (doc_id, fp) VALUES oracle for the winnow fingerprint gate. */
  def fingerprintOracleSql: String = valuesSql(
    corpus.map { case (id, t) => s"($id, ${fingerprint64Gold(t)})" },
    Seq("doc_id" -> "BIGINT", "fp" -> "BIGINT"), "doc_id")

  /** (doc_id, band_idx, band_hash) VALUES oracle for the LSH band table. */
  def minhashBandsOracleSql: String = valuesSql(
    corpus.flatMap { case (id, t) =>
      bandsGold(t).map { case (b, h) => s"($id, $b, $h)" }
    },
    Seq("doc_id" -> "BIGINT", "band_idx" -> "INTEGER", "band_hash" -> "BIGINT"),
    "doc_id, band_idx")

  /** (h, n_docs, n_occ, min_doc, max_doc) VALUES oracle for the fused
    * CDC duplicated-span reduce (spans present in >= minDocs docs). */
  def cdcOracleSql(minDocs: Int = 2): String = {
    val spans = corpus.flatMap { case (id, t) => cdcGold(t).map(h => (h, id)) }
    val rows = spans.groupBy(_._1).toSeq
      .map { case (h, occ) =>
        val ids = occ.map(_._2)
        (h, ids.distinct.size.toLong, occ.size.toLong, ids.min, ids.max)
      }
      .filter(_._2 >= minDocs)
      .sortBy(_._1)
      .map { case (h, nd, no, mn, mx) => s"($h, $nd, $no, $mn, $mx)" }
    valuesSql(rows,
      Seq("h" -> "BIGINT", "n_docs" -> "BIGINT", "n_occ" -> "BIGINT",
        "min_doc" -> "BIGINT", "max_doc" -> "BIGINT"), "h")
  }

  private def valuesSql(rows: Seq[String], cols: Seq[(String, String)],
      orderBy: String): String = {
    val proj = cols.map { case (c, tpe) => s"CAST($c AS $tpe) AS $c" }.mkString(", ")
    val names = cols.map(_._1).mkString(", ")
    s"""SELECT $proj
       |FROM (VALUES ${rows.mkString(",\n  ")}) AS t($names)
       |ORDER BY $orderBy""".stripMargin
  }
}
