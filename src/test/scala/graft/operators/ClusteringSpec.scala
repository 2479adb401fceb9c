package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kMeans separates two blobs with deterministic first-k init") {
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 0.0f)),
      (2L, Seq(0.2f, 0.0f)), (3L, Seq(10.2f, 0.0f)),
      (4L, Seq(0.1f, 0.1f)), (5L, Seq(10.1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val km = Clustering.kMeans(pts, "vec_id", "embedding", k = 2, dim = 2, iters = 3)
    val assign = km.assignments.as[(Long, Int)].collect().toMap
    assert(Seq(0L, 2L, 4L).forall(assign(_) == 0))
    assert(Seq(1L, 3L, 5L).forall(assign(_) == 1))
    val cents = km.centroids.as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // float32 inputs: 10.2f etc. carry ~1e-7 representation error
    assert(math.abs(cents((0, 0)) - 0.1) < 1e-6)
    assert(math.abs(cents((1, 0)) - 10.1) < 1e-6)
  }

  test("kMeans carries empty clusters forward and recovers them") {
    // seeds c0=c1=(0,0): every point ties to c0 in round 1, c1 empties
    // and keeps (0,0); round 2 re-captures the origin points with c1
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val km = Clustering.kMeans(pts, "vec_id", "embedding", k = 2, dim = 2, iters = 2)
    val cents = km.centroids.as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cents((0, 0)) == 5.0 && cents((0, 1)) == 0.0)
    assert(cents((1, 0)) == 0.0 && cents((1, 1)) == 0.0)
    val assign = km.assignments.as[(Long, Int)].collect().toMap
    assert(assign == Map(0L -> 1, 1L -> 1, 2L -> 0))
  }

  test("semanticDedup drops exact copies toward the smallest id, within clusters only") {
    // two far-apart blobs; ids 10 and 11 duplicate id 0 exactly, id 12
    // duplicates id 1 — each must report the SMALLEST near-dup id. The
    // non-duplicate blob members are at a real ANGLE to their blob mates
    // (cosine cares about direction, not distance — (0,1) vs (0,1.1)
    // would be cos 1.0)
    val pts = Seq(
      (0L, Seq(0.0f, 1.0f)), (1L, Seq(9.0f, 1.0f)),
      (2L, Seq(0.3f, 1.0f)), (3L, Seq(9.0f, 2.0f)),
      (10L, Seq(0.0f, 1.0f)), (11L, Seq(0.0f, 1.0f)), (12L, Seq(9.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.semanticDedup(pts, "vec_id", "embedding",
        k = 2, dim = 2, iters = 2, minCos = 0.9999)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((10L, 0L), (11L, 0L), (12L, 1L)))
    assert(out.forall(_._3 >= 0.9999))
  }

  test("semanticDedup refines an oversized copy family instead of going all-pairs") {
    // 200 exact copies + 40 randoms in ONE k-means cluster (k = 1),
    // block cap 16: the copies share every hyperplane sign (exact
    // copies are unsplittable by construction), so they land in an
    // OVERFLOW sub-bucket and are recalled through the sorted-
    // neighborhood chain — each copy pairs with exactly its next 4
    // id-neighbors, so dup_of is id−4 (floored at 0), never the
    // all-pairs global minimum for every row
    val base = Seq(3.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map(i => (i.toLong, base)) ++
      (0 until 40).map(i => (1000L + i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.semanticDedup(df, "vec_id", "embedding",
        k = 1, dim = 8, iters = 1, minCos = 0.999,
        maxBlock = 16, overflowWindow = 4)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == (1L to 199L), "every copy except id 0 must drop")
    assert(out.forall { case (id2, dup, cos) =>
      dup == math.max(0L, id2 - 4) && cos == 1.0
    }, s"windowed recall must chain 4 back: ${out.take(8)}")
    // the census must show the unsplittable family flagged overflow and
    // every unflagged sub-block within the cap
    val stats = Similarity.embeddingBlockStats(
      df.withColumn("c", org.apache.spark.sql.functions.lit(0)),
      "c", "vec_id", "embedding", 16, 8)
      .collect()
    assert(stats.exists(r => r.getBoolean(3) && r.getLong(2) >= 200L),
      "copy family must be an overflow block")
    assert(stats.filter(!_.getBoolean(3)).forall(_.getLong(2) <= 16L),
      "non-overflow sub-blocks must fit the cap")
  }

  test("kMeans validates its inputs") {
    val pts = Seq((0L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Clustering.kMeans(pts, "vec_id", "embedding", k = 2, dim = 2, iters = 1)
    }
    assertThrows[IllegalArgumentException] {
      Clustering.kMeans(pts, "vec_id", "embedding", k = 1, dim = 3, iters = 1)
    }
  }

  test("silhouette: separated labels score high, shuffled labels low") {
    // two tight orthogonal clouds
    def pt(base: (Float, Float), j: Float) = Seq(base._1 + j, base._2)
    val good = (0 until 6).map(i =>
      (i.toLong, i % 2,
        if (i % 2 == 0) pt((1f, 0f), i * 0.01f) else Seq(0f + i * 0.01f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val g = Clustering.silhouetteByLabel(good, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("mean_silhouette"))
      .toMap
    assert(g.values.forall(_ > 0.5), s"got $g")
    // same points with labels IGNORING geometry → near-zero/negative
    val bad = (0 until 6).map(i =>
      (i.toLong, i % 2,
        if (i < 3) pt((1f, 0f), i * 0.01f) else Seq(0f + i * 0.01f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val b = Clustering.silhouetteByLabel(bad, "vec_id", "embedding", "label")
      .collect().map(_.getAs[Double]("mean_silhouette"))
    assert(b.forall(_ < 0.3), s"got ${b.toSeq}")
  }

  test("dbscan: hand-built core/border/noise geometry") {
    // unit circle angles 0°, +8°, +16° (tight triple), −35° (fringe),
    // 90° (isolated); minCos=0.78 (≈38.7°), minPts=3:
    //  - 1,2,3 mutually ≥ cos16° = 0.961 → each deg+1 ≥ 3 → core,
    //    one component labeled min id 1
    //  - 4 sees only 1 (cos35° = 0.819; to 2/3: cos43°/cos51° < 0.78)
    //    → deg+1 = 2 → border, joins cluster 1
    //  - 5 orthogonal → noise, null cluster
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val pts = Seq((1L, "g", v(0)), (2L, "g", v(8)), (3L, "g", v(16)),
      (4L, "g", v(-35)), (5L, "g", v(90)))
      .toDF("vec_id", "x", "embedding")
    val got = Clustering.dbscan(pts, "vec_id", "embedding", "x",
        minCos = 0.78, minPts = 3, dim = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(1L) == ("core", 1L))
    assert(got(2L) == ("core", 1L))
    assert(got(3L) == ("core", 1L))
    assert(got(4L) == ("border", 1L))
    assert(got(5L) == ("noise", -1L))
  }

  test("dbscan: isolated core forms its own singleton cluster") {
    // a tight pair at minPts=2: both core via each other, component
    // label = min id; a lone far point stays noise
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val pts = Seq((7L, "g", v(0)), (9L, "g", v(5)), (11L, "g", v(120)))
      .toDF("vec_id", "x", "embedding")
    val got = Clustering.dbscan(pts, "vec_id", "embedding", "x",
        minCos = 0.9, minPts = 2, dim = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(7L) == ("core", 7L))
    assert(got(9L) == ("core", 7L))
    assert(got(11L) == ("noise", -1L))
  }

  test("semanticDedup k=0 auto-sizes the cluster count (production default)") {
    // 600 rows at targetCell 256 -> suggestedNlist = 3 clusters; the
    // planted copy pair must still be found regardless of sizing
    val pts = (0L until 600L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(4)(r.nextGaussian().toFloat))
    } :+ (9000L, {
      val r = new scala.util.Random(7L)
      (7L, Seq.fill(4)(r.nextGaussian().toFloat))._2
    })
    val df = pts.toDF("vec_id", "embedding")
    val out = Clustering.semanticDedup(df, "vec_id", "embedding",
        k = 0, dim = 4, iters = 2, minCos = 0.9999)
      .as[(Long, Long, Double)].collect().toSeq
    // 9000 duplicates vec 7 exactly -> it must be dropped toward 7
    assert(out.exists(t => t._1 == 9000L && t._2 == 7L), out.toString)
  }
}
