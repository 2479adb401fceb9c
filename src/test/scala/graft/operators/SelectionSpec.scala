package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorExprs

/** Subset-selection operators: greedy k-center (farthest-first) and
  * MMR — determinism, the k-center radius contract, MMR's
  * relevance/diversity trade, and a planted-structure recovery check. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("farthestFirst is deterministic and radii are non-increasing") {
    val a = Selection.farthestFirst(emb, "vec_id", "embedding", 8).collect()
    val b = Selection.farthestFirst(emb, "vec_id", "embedding", 8).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
    // seed is the lowest id with a null radius
    assert(a.head.getInt(0) == 1 && a.head.isNullAt(2))
    val radii = a.tail.map(_.getDouble(2))
    radii.sliding(2).foreach { case Array(x, y) => assert(y <= x + 1e-12) }
    // selected ids are distinct
    assert(a.map(_.getLong(1)).distinct.length == 8)
  }

  test("farthestFirst round 2 picks a planted antipode of the seed") {
    // cosine distance to the seed's exact negation is 2 — the maximum
    // possible — so round 2 must select it (random pairs sit near 1)
    val seedVec = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).as[Seq[Float]].head()
    val planted = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((99999L, seedVec.map(x => -x)))
        .toDF("vec_id", "embedding"))
    val sel = Selection.farthestFirst(planted, "vec_id", "embedding", 3)
      .collect()
    assert(sel(1).getLong(1) == 99999L, s"round 2 was ${sel(1)}")
    assert(math.abs(sel(1).getDouble(2) - 2.0) < 1e-9)
  }

  test("mmr round 1 is the most query-similar candidate; later rounds trade diversity") {
    val sel = Selection.mmr(emb, "vec_id", "embedding", 6).collect()
    assert(sel.length == 6)
    assert(sel.map(_.getLong(1)).distinct.length == 6)
    // recompute round-1 by brute force: max round-6 cosine to vec 0's
    // embedding over all ids > the query id
    val q = emb.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head()
    val best = emb.filter(col("vec_id") =!= q._1)
      .select(col("vec_id"),
        round(VectorExprs.cosine(col("embedding"), typedLit(q._2)), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(1)
      .as[(Long, Double)].head()
    assert(sel.head.getLong(1) == best._1)
    assert(math.abs(sel.head.getDouble(2) - best._2) < 1e-12)
    // the query vector itself is never selected
    assert(!sel.map(_.getLong(1)).contains(q._1))
  }

  test("mmr with lambda=1 degenerates to plain top-k by relevance") {
    val sel = Selection.mmr(emb, "vec_id", "embedding", 5, lambda = 1.0)
      .collect()
    val q = emb.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head()
    val topk = emb.filter(col("vec_id") =!= q._1)
      .select(col("vec_id"),
        round(VectorExprs.cosine(col("embedding"), typedLit(q._2)), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(5)
      .as[(Long, Double)].collect()
    assert(sel.map(_.getLong(1)).toSeq == topk.map(_._1).toSeq)
  }

  test("coverageCurve is non-decreasing and total at the final selection radius") {
    val centers = Selection.farthestFirstCenters(emb, "vec_id", "embedding", 8)
    val lastRadius = centers.last._3.get
    val n = emb.count()
    val curve = Selection.coverageCurve(emb, "vec_id", "embedding",
      centers.map(_._2), Seq(lastRadius / 2, lastRadius, 2.0)).collect()
    val covs = curve.map(_.getLong(1))
    covs.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    // greedy invariant: after the k-th pick every point sits within the
    // k-th radius of the selected set
    assert(covs(1) == n)
    assert(covs(2) == n)
  }

  // plain-Scala reference twins (the soundex-golden pattern: an
  // INDEPENDENT implementation sharing only the arithmetic contract —
  // left-fold float→double cosine accumulation, BigDecimal HALF_UP
  // round-6, IEEE score arithmetic, lowest-id ties)
  private def refCos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i).toDouble
      ny += b(i).toDouble * b(i).toDouble
    }
    java.math.BigDecimal.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def refFarthestFirst(corpus: Seq[(Long, Seq[Float])],
      k: Int): Seq[(Long, Option[Double])] = {
    var sel = Vector(corpus.minBy(_._1))
    var out = Vector[(Long, Option[Double])]((sel.head._1, None))
    while (sel.size < k) {
      val cand = corpus.filterNot(c => sel.exists(_._1 == c._1))
        .map { case (id, v) =>
          (id, sel.map(s => 1.0 - refCos(v, s._2)).min)
        }
      val (id, d) = cand.maxBy { case (id, d) => (d, -id) }
      sel :+= corpus.find(_._1 == id).get
      out :+= ((id, Some(d)))
    }
    out
  }

  private def refMmr(corpus: Seq[(Long, Seq[Float])], k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val q = corpus.minBy(_._1)
    val cands = corpus.filterNot(_._1 == q._1)
      .map { case (id, v) => (id, v, refCos(v, q._2)) }
    var sel = Vector[(Long, Seq[Float], Double)]()
    while (sel.size < k) {
      val scored = cands.filterNot(c => sel.exists(_._1 == c._1))
        .map { case (id, v, rel) =>
          val s = if (sel.isEmpty) rel
          else lambda * rel - (1.0 - lambda) * sel.map(x => refCos(v, x._2)).max
          (id, v, s)
        }
      sel :+= scored.maxBy { case (id, _, s) => (s, -id) }
    }
    sel.map { case (id, _, s) => (id, s) }
  }

  test("farthestFirst matches an independent plain-Scala greedy on random corpora") {
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { _ =>
      val n = 10 + rnd.nextInt(20)
      val corpus = (0 until n).map(i =>
        ((i * 3 + 1).toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      val eng = Selection.farthestFirst(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(eng.toSeq == refFarthestFirst(corpus, 5))
    }
  }

  test("mmr matches an independent plain-Scala recompute on random corpora") {
    val rnd = new scala.util.Random(11L)
    (1 to 3).foreach { _ =>
      val n = 10 + rnd.nextInt(20)
      val corpus = (0 until n).map(i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      val eng = Selection.mmr(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(eng.toSeq == refMmr(corpus, 5, 0.7))
    }
  }

  test("knnGraph: every node's neighbor list is its exhaustive top-k within the label") {
    val k = 3
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", "label", k,
      dim = 64)
    // exhaustive twin over a couple of labels
    val sub = emb.filter(col("label").isin(0, 1))
    val ex = sub.alias("a").join(sub.alias("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.label").as("label"), col("a.vec_id").as("id"),
        col("b.vec_id").as("nbr"),
        round(VectorExprs.cosine(col("a.embedding"), col("b.embedding")), 6)
          .as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"), col("id"))
      .orderBy(col("cos").desc, col("nbr"))
    val exTop = ex.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("label", "id", "rank", "nbr", "cos")
    val diff = g.filter(col("label").isin(0, 1))
      .unionByName(exTop).groupBy("label", "id", "rank", "nbr", "cos")
      .count().filter(col("count") =!= 2).count()
    assert(diff == 0)
  }
}
