package graft.operators
// (leakageMatrix coverage appended below)

import graft.SparkSpec

/** Exact prefix-filtered Jaccard join ([[SetSimJoin.jaccardJoin]]):
  * recall-1 completeness against brute force, hot-token pruning. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), Double] = {
    val sets = docs.map { case (id, s) =>
      id -> s.trim.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      o = (si & sj).size
      jac = o.toDouble / (si | sj).size
      if jac >= t
    } yield (i, j) -> (math.rint(jac * 1e6) / 1e6)).toMap
  }

  test("jaccardJoin is EXACT: matches brute force on a planted corpus") {
    val rnd = new scala.util.Random(99)
    val vocab = (0 until 30).map(i => s"v$i")
    val docs = (0L until 40L).map { i =>
      val n = 4 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } ++ Seq((40L, "v1 v2 v3 v4"), (41L, "v1 v2 v3 v4"), // exact dup pair
      (42L, "v1 v2 v3 v5"),                              // 3/5 vs 40
      (43L, "   "), (44L, ""))                           // blank docs drop
    val expected = bruteForce(docs, 0.5)
    assert(expected.nonEmpty, "fixture produced no overlapping pairs")
    val got = SetSimJoin.jaccardJoin(docs.toDF("id", "text"), "id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    assert(got.contains((40L, 41L)) && got((40L, 41L)) == 1.0)
  }

  test("a corpus-wide stopword never reaches the candidate index") {
    // every doc shares 'common' but is otherwise disjoint: J = 1/7 for
    // every pair, far below t=0.5 — and because the hot token sorts
    // LAST in the rarity order it is excluded from every prefix, so the
    // candidate join emits nothing at all instead of n² rows keyed on
    // the stopword
    val docs = (0L until 200L).map(i =>
      (i, s"common u${i}a u${i}b u${i}c"))
    val out = SetSimJoin.jaccardJoin(docs.toDF("id", "text"), "id", "text", 0.5)
    assert(out.isEmpty)
  }

  test("threshold 1.0 finds exactly the identical token sets") {
    val docs = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "a b"), (4L, "x y"))
      .toDF("id", "text")
    val got = SetSimJoin.jaccardJoin(docs, "id", "text", 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0))) // set semantics: dup token collapses
  }

  test("leakageMatrix rolls pairs up by normalized source pair") {
    // near-identical docs: 1≈2 (cross web/books), 1≈5 and 2≈5 (web side),
    // 3≈4 within books; 6 unrelated
    val docs = Seq(
      (1L, "a b c d e", "web"), (2L, "a b c d e", "books"),
      (5L, "a b c d e", "web"),
      (3L, "p q r s t", "books"), (4L, "p q r s t", "books"),
      (6L, "x y z w v", "code")
    ).toDF("id", "text", "src")
    val got = SetSimJoin.leakageMatrix(docs, "id", "text", "src", 0.8)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("books", "web") -> ((2L, 1.0)),  // 1-2 and 2-5 cross the sources
      ("web", "web") -> ((1L, 1.0)),    // 1-5
      ("books", "books") -> ((1L, 1.0)) // 3-4
    ))
  }

  test("jaccardShingleJoin: exact trigram-shingle pairs") {
    import spark.implicits._
    // doc1/doc2 share 4 of their shingles; doc3 unrelated.
    // doc1 shingles: {a b c, b c d, c d e} ; doc2: {a b c, b c d, c d e,
    // d e f} → jaccard = 3/4 = 0.75
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("id", "text")
    val at07 = SetSimJoin.jaccardShingleJoin(docs, "id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(at07.toSeq == Seq((1L, 2L, 0.75)))
    val at08 = SetSimJoin.jaccardShingleJoin(docs, "id", "text", 3, 0.8)
    assert(at08.isEmpty)
  }

  test("lshRecallEval: identical docs are found with full recall") {
    import spark.implicits._
    val long1 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val long2 = (41 to 70).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long1), (2L, long1), (3L, long2))
      .toDF("id", "text")
    val r = Dedup.lshRecallEval(docs, "id", "text",
      minRecall = 1.0, minPrecision = 0.5).head()
    assert(r.getAs[Long]("n_truth") == 1L)
    assert(r.getAs[Boolean]("recall_ok"))
    assert(r.getAs[Boolean]("precision_ok"))
  }

  test("lshRecallEval refuses a vacuous (empty-truth) contract") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      (2L, (41 to 70).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.lshRecallEval(docs, "id", "text")
    }
    assert(e.getMessage.contains("vacuous"))
  }
}
