package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-tests the round-13 optimization candidate "every unordered
  * pair meets exactly one final block, so [[Dedup.fuzzyPairs]] can drop
  * its distincts" (VERDICT r12 ask #5) — and pins the NEGATIVE result:
  *
  * The claim is FALSE. The adaptive block map keys blocks by (prefix,
  * length-bucket) with no depth tag, and a SHORT string's exact-group
  * entry is keyed by the whole string — which is also a prefix of
  * longer chains whose parent block went oversized. Such a row crosses
  * TWO map entries for one bucket, so a pair can reach the verifier
  * through both (first test below constructs 36 duplicate crossings on
  * a 250-row corpus at maxBlock=3). The distincts inside fuzzyPairs are
  * therefore LOAD-BEARING; removing any of them changes hash-gated
  * outputs. Re-keying the map by (depth, prefix) would restore
  * uniqueness but CHANGES THE RECALL SET (pairs currently recalled
  * through the extra crossings disappear), so it is not an
  * optimization — it is a different operator.
  *
  * What stays guaranteed (and pinned here): the OUTPUT is duplicate-
  * free, every emitted pair is a true pair (precision 1), and the
  * length-band-only branch is full-recall.
  */
class FuzzyPairUniqueSpec extends SparkSpec {
  import spark.implicits._

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abc"
    (1 to n).map { i =>
      val len = rnd.nextInt(8) // 0..7, includes empty strings
      val s =
        if (rnd.nextInt(5) == 0) "aaab".take(len) // exact-copy family + shared prefixes
        else (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (i.toLong, s)
    }
  }

  private def truePairs(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long)] =
    (for {
      (i1, s1) <- rows
      (i2, s2) <- rows
      if i1 < i2 && math.abs(s1.length - s2.length) <= maxDist &&
        levenshtein(s1, s2) <= maxDist
    } yield (i1, i2)).toSet

  test("pair-meets-one-block is FALSE: chains cross multiple map entries " +
      "under forced refinement (the distincts are load-bearing)") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val rows = corpus(seed, 250)
      val df = rows.toDF("id", "s")
      // output must be duplicate-free and sound even on the
      // adversarial corpus…
      val out = Dedup.fuzzyPairs(df, "id", "s", maxDist = 2,
          maxBlock = 3, maxPrefix = 3, overflowWindow = 2)
        .select("id1", "id2").as[(Long, Long)].collect().toSeq
      assert(out.size == out.distinct.size, s"seed=$seed: output has duplicates")
      val truth = truePairs(rows, 2)
      assert(out.forall(truth.contains), s"seed=$seed: non-pairs emitted")
      // …and the multiplicity counterexample must exist: a row whose
      // prefix chain matches MORE than one final block key for its
      // bucket (the structural reason the distincts cannot go)
      val w = 3 // maxDist 2
      val blockMap = Dedup.fuzzyBlockStats(df, "id", "s", maxDist = 2,
          maxBlock = 3, maxPrefix = 3)
        .select(col("prefix").as("__p"), col("len_bucket").as("__b"))
      val crossings = df
        .select(col("id"), expr(s"length(s) div $w").as("__b"),
          explode(array_distinct(array(
            (1 to 3).map(k => substring(col("s"), 1, k)): _*))).as("__p"))
        .join(blockMap, Seq("__p", "__b"))
        .groupBy("id", "__b").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
      assert(crossings.count() > 0,
        s"seed=$seed: expected multi-entry crossings — if this ever " +
          "reaches zero on all seeds, the uniqueness claim may have " +
          "become true and the distincts can be re-examined")
    }
  }

  test("fuzzyPairs is duplicate-free and EXACT with length-band-only blocking") {
    val rows = corpus(11L, 200)
    val df = rows.toDF("id", "s")
    val out = Dedup.fuzzyPairs(df, "id", "s", maxDist = 2, blockChar = false)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    assert(out.size == out.distinct.size, "duplicate pairs in the full-recall branch")
    assert(out.toSet == truePairs(rows, 2),
      "length-band blocking must be full-recall")
  }

  test("fuzzyPairs output stays duplicate-free at production-ish settings") {
    val rows = corpus(23L, 300)
    val df = rows.toDF("id", "s")
    val out = Dedup.fuzzyPairs(df, "id", "s", maxDist = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    assert(out.size == out.distinct.size)
    assert(out.toSet.subsetOf(truePairs(rows, 1)))
  }
}
