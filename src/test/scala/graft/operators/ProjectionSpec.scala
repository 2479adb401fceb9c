package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JL random projection semantics ([[Projection.randomProject]]). */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def vec(seed: Int): Seq[Float] =
    Seq.tabulate(dim)(i => ((seed * 31 + i * 7) % 11 - 5).toFloat / 4f)

  test("projection matches a driver-side recomputation exactly") {
    val df = Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding")
    val got = Projection.randomProject(df, "embedding", dim, 4, "t1")
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])]
      .collect().toMap
    val signs = Projection.signMatrix(dim, 4, "t1")
    def proj(v: Seq[Float]): Seq[Double] = (0 until 4).map { j =>
      val s = v.indices.map(i => BigDecimal(v(i).toDouble * signs(i)(j))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      math.rint((s.toDouble / math.sqrt(4.0)) * 1e6) / 1e6
    }
    assert(got(1L) == proj(vec(1)))
    assert(got(2L) == proj(vec(2)))
  }

  test("JL preserves pairwise distance within the lemma's distortion") {
    // 20 vectors, 16 → 8 dims: check relative distance distortion stays
    // sane (not a tight bound — a smoke check that the matrix behaves)
    val vs = (1 to 20).map(s => (s.toLong, vec(s)))
    val df = vs.toDF("vec_id", "embedding")
    val p = Projection.randomProject(df, "embedding", dim, 8, "t2")
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])]
      .collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 1 to 19; j <- (i + 1) to 20
      orig = d2(vs(i - 1)._2.map(_.toDouble), vs(j - 1)._2.map(_.toDouble))
      if orig > 1e-9
    } yield d2(p(i.toLong), p(j.toLong)) / orig
    assert(ratios.nonEmpty)
    // mean ratio near 1, individual ratios bounded away from degenerate
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0))
  }

  test("deterministic across runs and partitionings; bad args rejected") {
    val df = Seq((1L, vec(3))).toDF("vec_id", "embedding")
    val a = Projection.randomProject(df, "embedding", dim, 4, "s")
      .select("proj").as[Seq[Double]].head()
    val b = Projection.randomProject(df.repartition(4), "embedding", dim, 4, "s")
      .select("proj").as[Seq[Double]].head()
    assert(a == b)
    assertThrows[IllegalArgumentException] {
      Projection.randomProject(df, "embedding", dim, dim + 1, "s")
    }
  }
}
