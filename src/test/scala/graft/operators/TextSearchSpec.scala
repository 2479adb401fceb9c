package graft.operators

import graft.SparkSpec

/** BM25 search semantics: tf saturation, idf downweighting, match-only
  * output, deterministic tie-breaks. */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark query engine"),
    (2L, "query query query"),
    (3L, "nothing here"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("repeated-term docs rank higher; non-matching docs are absent") {
    val top = TextSearch.bm25Search(docs, "doc_id", "text", Seq("query"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.map(_._1) == Seq(2L, 1L)) // tf=3 beats tf=1; docs 3,4 absent
    assert(top.head._2 > top(1)._2)
  }

  test("idf downweights ubiquitous terms against rare ones") {
    val d = Seq(
      (1L, "the rare word"),
      (2L, "the common word"),
      (3L, "the usual word"),
      (4L, "the plain word")
    ).toDF("doc_id", "text")
    // doc 1 matches both terms; its 'rare' contribution (df=1) must
    // dominate the 'the' contribution (df=4) — scored via two
    // single-term searches on the same corpus
    val rareScore = TextSearch.bm25Search(d, "doc_id", "text", Seq("rare"), 10)
      .collect().head.getDouble(1)
    val theScore = TextSearch.bm25Search(d, "doc_id", "text", Seq("the"), 10)
      .collect().head.getDouble(1)
    assert(rareScore > theScore)
  }

  test("k bounds the output and ties break by id ascending") {
    val d = Seq(
      (5L, "query alpha"), (3L, "query beta"), (9L, "query gamma")
    ).toDF("doc_id", "text")
    val top = TextSearch.bm25Search(d, "doc_id", "text", Seq("query"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(3L, 5L)) // equal scores → id ascending, capped at k
  }

  test("empty query is rejected") {
    assertThrows[IllegalArgumentException] {
      TextSearch.bm25Search(docs, "doc_id", "text", Seq.empty, 5)
    }
  }

  test("phraseSearch matches consecutive tokens only, counts occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data big data big"),   // "big data" twice
      (2L, "data big"),                // reversed — no match
      (3L, "big x data"),              // gap — no match
      (4L, "big data")                 // once
    ).toDF("doc_id", "text")
    val got = TextSearch.phraseSearch(docs, "doc_id", "text", "big data")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
  }

  test("phraseSearch handles 3-word phrases and repeated words") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b a a b"),   // "a a b" at 0 and 3
      (2L, "a b a a b"),     // at 2
      (3L, "a b a b")        // never
    ).toDF("doc_id", "text")
    val got = TextSearch.phraseSearch(docs, "doc_id", "text", "a a b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    assertThrows[IllegalArgumentException] {
      TextSearch.phraseSearch(docs, "doc_id", "text", "solo")
    }
  }
}
