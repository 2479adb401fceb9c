package graft.operators

import graft.SparkSpec

/** Related-items semantics ([[Cooccurrence.relatedItems]]). */
class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  // baskets: b1 {1,2,3}, b2 {1,2}, b3 {1,2}, b4 {2,4}, b5 {9} (no pair),
  // b6 is a mega-basket excluded by maxBasket, nulls dropped
  private lazy val rows = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L), // dup item in basket: one pair
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L),
    (4L, 2L), (4L, 4L),
    (5L, 9L)
  ).toDF("b", "i")

  test("pair counts are shared-basket counts over DISTINCT basket items") {
    val got = Cooccurrence.relatedItems(rows, "b", "i", k = 3)
      .as[(Long, Int, Long, Long)].collect().toSet
    // item 1 co-occurs with 2 in b1,b2,b3 (n=3) and 3 in b1 (n=1)
    assert(got.contains((1L, 0, 2L, 3L)))
    assert(got.contains((1L, 1, 3L, 1L)))
    // symmetric direction exists with its own ranking
    assert(got.contains((2L, 0, 1L, 3L)))
    // item 9's singleton basket yields no pairs at all
    assert(!got.exists(_._1 == 9L))
  }

  test("rank is 0-based, capped at k, ties break by co_item descending") {
    // item 2 pairs: with 1 (n=3), 4 (n=1), 3 (n=1) — tie between 4 and 3
    // breaks by co_item DESC → 4 before 3
    val two = Cooccurrence.relatedItems(rows, "b", "i", k = 2)
      .where("item = 2").as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    assert(two.toSeq == Seq((2L, 0, 1L, 3L), (2L, 1, 4L, 1L)))
  }

  test("string item columns keep a deterministic tie order across layouts") {
    // string SKUs with a 3-way count tie for item "a": co-items "b","c","d"
    // all share n=1 — the tie key must distinguish them (a bigint cast of
    // a string is null → partition-dependent winner)
    val sku = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "c"),
      (3L, "a"), (3L, "d")
    ).toDF("b", "i")
    val base = Cooccurrence.relatedItems(sku, "b", "i", k = 2)
      .where("item = 'a'").as[(String, Int, String, Long)].collect().toSeq
    assert(base.length == 2 && base.forall(_._4 == 1L))
    // identical selection AND order on every physical layout
    (1 to 5).foreach { p =>
      val again = Cooccurrence.relatedItems(sku.repartition(p), "b", "i", k = 2)
        .where("item = 'a'").as[(String, Int, String, Long)].collect().toSeq
      assert(again == base, s"tie order changed under repartition($p)")
    }
  }

  test("maxBasket excludes degenerate baskets instead of exploding them") {
    val mega = (1L to 100L).map(i => (7L, i)).toDF("b", "i")
    val got = Cooccurrence.relatedItems(rows.union(mega), "b", "i",
      k = 3, maxBasket = 50)
    // the mega-basket contributes nothing; counts match the base fixture
    val base = Cooccurrence.relatedItems(rows, "b", "i", k = 3)
    assert(got.collect().toSet == base.collect().toSet)
  }
}
