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

  test("associationRules: textbook support/confidence/lift on a tiny corpus") {
    // baskets: {x,y} ×3, {x} ×1, {y} ×1, {x,z} ×1 → N=6
    val bi = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (3L, "y"), (4L, "x"), (5L, "y"), (6L, "x"), (6L, "z")).toDF("b", "i")
    val got = Cooccurrence.associationRules(bi, "b", "i", minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    // x→y: n_ab=3, supp 3/6, conf 3/5 (x in 5), lift 3·6/(5·4)=0.9
    assert(got(("x", "y")) == ((3L, 0.5, 0.6, 0.9)))
    // y→x mirrors with conf 3/4
    assert(got(("y", "x")) == ((3L, 0.5, 0.75, 0.9)))
    // x→z: n=1, conf 1/5, lift 6/5 = 1.2
    assert(got(("x", "z")) == ((1L, math.round(1.0 / 6 * 1e6) / 1e6, 0.2, 1.2)))
  }

  test("associationRules dedupes repeated items and applies minSupport") {
    val bi = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("b", "i")
    val got = Cooccurrence.associationRules(bi, "b", "i", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "a"))) // (a,c) at support 1 drops
  }
}
