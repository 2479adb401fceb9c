package graft.operators

import graft.SparkSpec

/** RRF hybrid-fusion semantics ([[Fusion.reciprocalRankFusion]]). */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lex = Seq((10L, 9.0), (20L, 7.5), (30L, 4.0))
    .toDF("id", "score")
  private lazy val sem = Seq((20L, 0.99), (40L, 0.80), (10L, 0.70))
    .toDF("id", "score")

  test("fused score sums 1/(k+rank) across lists") {
    val got = Fusion.reciprocalRankFusion(Seq(lex, sem), "id", "score",
      kRrf = 60, topK = 10).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def c(r: Int) = math.round(1.0 / (60 + r) * 1e9) / 1e9
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-6
    // 20 ranks 2nd lexically, 1st semantically — tops the fusion
    assert(got(20L)._1 == 2L && close(got(20L)._2, c(2) + c(1)))
    assert(got(10L)._1 == 2L && close(got(10L)._2, c(1) + c(3)))
    assert(got(40L)._1 == 1L && close(got(40L)._2, c(2)))
    assert(got(30L)._1 == 1L && close(got(30L)._2, c(3)))
  }

  test("ranking is deterministic under score ties (id ascending)") {
    val tied = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("id", "score")
    val got = Fusion.reciprocalRankFusion(Seq(tied), "id", "score",
      kRrf = 60, topK = 3).as[(Long, Long, Double)].collect().toSeq
    // ties rank by id asc → 3 before 5 before 9, fused order follows
    assert(got.map(_._1) == Seq(3L, 5L, 9L))
  }

  test("topK bounds the fused output") {
    val got = Fusion.reciprocalRankFusion(Seq(lex, sem), "id", "score",
      kRrf = 60, topK = 2).collect()
    assert(got.length == 2)
  }
}
