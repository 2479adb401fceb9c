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
}
