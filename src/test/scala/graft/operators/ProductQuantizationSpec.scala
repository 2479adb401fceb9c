package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PQ semantics ([[ProductQuantization]]): encode matches a driver-side
  * brute force against the trained codebooks; ADC finds the planted
  * nearest vector; contract checks. */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // 60 deterministic 8-dim vectors + a planted near-copy of the query
  private lazy val vecs: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(42)
    (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextDouble()))) :+
      (60L, Array(0.9, 0.1, 0.2, 0.8, 0.3, 0.7, 0.4, 0.6))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("encode assigns each subspace to its nearest codebook centroid") {
    val model = ProductQuantization.train(df, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iters = 2)
    assert(model.subDim == 4 && model.k == 4)
    val got = ProductQuantization.encode(df, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    // driver-side brute force from the same codebooks
    vecs.foreach { case (id, v) =>
      val expected = (0 until 2).map { j =>
        val s = v.slice(j * 4, j * 4 + 4)
        model.codebooks(j).zipWithIndex.map { case (c, cid) =>
          (c.zip(s).map { case (a, b) => (b - a) * (b - a) }.sum, cid)
        }.min._2 // min by (dist, cid) — the fused expression's tie rule
      }
      assert(got(id) == expected, s"vec $id: ${got(id)} vs $expected")
    }
  }

  test("adcTopK surfaces the planted near-copy of the query first") {
    val model = ProductQuantization.train(df, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iters = 2)
    val query = Array(0.9, 0.1, 0.2, 0.8, 0.3, 0.7, 0.4, 0.6) // == vec 60
    val enc = ProductQuantization.encode(df, "vec_id", "embedding", model)
    val top = ProductQuantization.adcTopK(enc, "vec_id", "codes",
      model, query, 61).as[(Long, Double)].collect()
    assert(top.length == 61)
    // vec 60 IS the query, so its codes are the per-subspace argmins and
    // its ADC distance is the global minimum — but coarse codebooks put
    // many vectors in the same minimal cell, and ties break by id, so
    // assert the minimal-cell property rather than a literal rank
    val d60 = top.find(_._1 == 60L).get._2
    assert(top.head._2 == d60, s"planted vector not in the minimal ADC cell")
    // distances ascend and are deterministic across layouts
    assert(top.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    val again = ProductQuantization.adcTopK(
      ProductQuantization.encode(df.repartition(7), "vec_id", "embedding", model),
      "vec_id", "codes", model, query, 61).as[(Long, Double)].collect()
    assert(again.toSeq == top.toSeq)
  }

  test("contracts: dim must split; query dim must match") {
    assertThrows[IllegalArgumentException] {
      ProductQuantization.train(df, "vec_id", "embedding", 8, 3, 2, 1)
    }
    val model = ProductQuantization.train(df, "vec_id", "embedding", 8, 2, 2, 1)
    assertThrows[IllegalArgumentException] {
      ProductQuantization.lookupTables(model, Array(1.0, 2.0))
    }
  }
}
