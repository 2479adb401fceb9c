package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.SetSketch

/** KmvSketch — the bounded k-minimum-values distinct sketch and its set
  * algebra. Multi-partition inputs force the full TypedImperativeAggregate
  * lifecycle (partial buffers → serialize → merge → eval). */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16

  test("sketch is the k smallest distinct hashes, merge-order independent") {
    val df = spark.range(0, 5000)
      .select(SetSketch.hash60(col("id")).as("h"))
    val single = df.coalesce(1)
      .agg(SetSketch.kmvSketch(col("h"), k)).head().getSeq[Long](0)
    val many = df.repartition(17)
      .agg(SetSketch.kmvSketch(col("h"), k)).head().getSeq[Long](0)
    val truth = df.distinct().orderBy(col("h")).limit(k)
      .as[Long].collect().toSeq
    assert(single == truth)
    assert(many == truth)
  }

  test("below capacity the sketch is the whole distinct set and estimate is exact") {
    val df = spark.range(0, 10).select(SetSketch.hash60(col("id")).as("h"))
      .union(spark.range(0, 10).select(SetSketch.hash60(col("id")).as("h")))
      .repartition(5)
    val out = df.agg(
      SetSketch.kmvSketch(col("h"), k).as("sk"))
      .select(size(col("sk")).as("n"),
        SetSketch.estimateDistinct(col("sk"), k).as("est"))
      .head()
    assert(out.getInt(0) == 10)
    assert(out.getDouble(1) == 10.0)
  }

  test("estimator lands near truth on a uniform domain") {
    val n = 20000
    val est = spark.range(0, n)
      .select(SetSketch.hash60(col("id")).as("h"))
      .agg(SetSketch.kmvSketch(col("h"), 256).as("sk"))
      .select(SetSketch.estimateDistinct(col("sk"), 256)).head().getDouble(0)
    // KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 3σ
    assert(math.abs(est - n) / n < 0.19, s"est=$est truth=$n")
  }

  test("union sketch equals the sketch of the union (closure)") {
    val a = spark.range(0, 3000).select(SetSketch.hash60(col("id")).as("h"))
    val b = spark.range(2000, 6000).select(SetSketch.hash60(col("id")).as("h"))
    val ska = a.agg(SetSketch.kmvSketch(col("h"), k).as("s")).head().getSeq[Long](0)
    val skb = b.agg(SetSketch.kmvSketch(col("h"), k).as("s")).head().getSeq[Long](0)
    val direct = a.union(b)
      .agg(SetSketch.kmvSketch(col("h"), k).as("s")).head().getSeq[Long](0)
    val viaArrays = Seq((ska, skb)).toDF("a", "b")
      .select(SetSketch.unionSketch(col("a"), col("b"), k)).head().getSeq[Long](0)
    assert(viaArrays == direct)
  }

  test("jaccard/intersection estimates are exact below capacity") {
    // |A|=8, |B|=6, |A∩B|=4 — all below k, so the sketch algebra is exact
    val a = spark.range(0, 8).select(SetSketch.hash60(col("id")).as("h"))
      .agg(SetSketch.kmvSketch(col("h"), k).as("s")).head().getSeq[Long](0)
    val b = spark.range(4, 10).select(SetSketch.hash60(col("id")).as("h"))
      .agg(SetSketch.kmvSketch(col("h"), k).as("s")).head().getSeq[Long](0)
    val out = Seq((a, b)).toDF("a", "b")
      .select(SetSketch.jaccardEstimate(col("a"), col("b"), k).as("j"),
        SetSketch.intersectionEstimate(col("a"), col("b"), k).as("i"))
      .head()
    assert(out.getDouble(0) == 4.0 / 10.0)
    assert(out.getDouble(1) == 4.0)
  }

  test("negative hash input throws the contract error") {
    val ex = intercept[Exception] {
      Seq(-1L).toDF("h").agg(SetSketch.kmvSketch(col("h"), k)).head()
    }
    assert(ex.getMessage != null)
  }

  test("null hashes are skipped like SQL aggregates") {
    val out = Seq(Some(5L), None, Some(3L), Some(5L)).toDF("h")
      .agg(SetSketch.kmvSketch(col("h"), k)).head().getSeq[Long](0)
    assert(out == Seq(3L, 5L))
  }
}
