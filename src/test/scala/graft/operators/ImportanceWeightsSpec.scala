package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** DSIR importance-weight semantics ([[ImportanceWeights.dsirLogRatios]]). */
class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: two "target-like" docs full of `good`, two full of `bad`;
  // the target corpus is `good`-heavy — target-like docs must score higher
  private lazy val raw = Seq(
    (1L, "good good good nice"),
    (2L, "good nice good good"),
    (3L, "bad awful bad bad"),
    (4L, "bad bad awful bad")
  ).toDF("id", "text")
  private lazy val target = Seq(
    (100L, "good nice good good nice good")
  ).toDF("id", "text")

  test("target-like documents score above off-target documents") {
    val got = ImportanceWeights.dsirLogRatios(raw, target, "id", "text",
      buckets = 64).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(3L) && got(2L) > got(4L))
    // same bag of words → identical score
    assert(got(1L) == got(2L) && got(3L) == got(4L))
  }

  test("token counts are per-occurrence, empty docs drop out") {
    val withEmpty = raw.union(Seq((9L, "   ")).toDF("id", "text"))
    val got = ImportanceWeights.dsirLogRatios(withEmpty, target, "id",
      "text", buckets = 64).orderBy("id").collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.forall(_.getAs[Long]("n_tokens") == 4L))
  }

  test("scores are layout-independent") {
    def run(parts: Int): Seq[Row] =
      ImportanceWeights.dsirLogRatios(raw.repartition(parts), target,
        "id", "text", buckets = 64).orderBy("id").collect().toSeq
    assert(run(1) == run(5))
  }

  test("a uniform target over the raw corpus itself scores near zero") {
    // scoring the corpus against itself: p_t = p_r → every λ is 0
    val got = ImportanceWeights.dsirLogRatios(raw, raw, "id", "text",
      buckets = 64).as[(Long, Long, Double)].collect()
    assert(got.forall(r => math.abs(r._3) < 1e-9))
  }
}
