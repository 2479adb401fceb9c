package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PCA: Jacobi eigen-solve correctness on known matrices, projection
  * variance ordering, layout independence of the one-pass moment fit. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)) and 1 (along (1,-1))
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.zip(vectors).sortBy(-_._1)
    assert(math.abs(sorted(0)._1 - 3.0) < 1e-10)
    assert(math.abs(sorted(1)._1 - 1.0) < 1e-10)
    val top = sorted(0)._2
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(top(0) - top(1)) < 1e-10, "top eigenvector is (1,1)/√2")
  }

  test("fit recovers the dominant axis of a stretched blob") {
    // points spread 10× further along (1,1,0) than any other direction
    val rnd = new scala.util.Random(5)
    val rows = (1 to 400).map { i =>
      val main = rnd.nextGaussian() * 10.0
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (i.toLong, Seq(
        (main + a).toFloat, (main - a).toFloat, b.toFloat, (0.3 * b).toFloat))
    }
    val df = rows.toDF("id", "vec")
    val model = Pca.fit(df, "vec", dim = 4, k = 2)
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1),
      s"dominant axis not found: ${model.eigenvalues.toSeq}")
    val w = model.components(0)
    // dominant component ∝ (1,1,0,0)/√2, sign-normalized positive
    assert(math.abs(w(0) - w(1)) < 0.05 && w(0) > 0.6,
      s"unexpected top component: ${w.toSeq}")
    assert(math.abs(w(2)) < 0.1 && math.abs(w(3)) < 0.1)
  }

  test("fit is layout-independent; projection variance follows eigenvalue order") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map(i =>
      (i.toLong, Seq.fill(6)(rnd.nextGaussian().toFloat)))
    val df1 = rows.toDF("id", "vec")
    val df13 = rows.toDF("id", "vec").repartition(13)
    val m1 = Pca.fit(df1, "vec", 6, 3)
    val m13 = Pca.fit(df13, "vec", 6, 3)
    assert(m1.components.map(_.toSeq).toSeq == m13.components.map(_.toSeq).toSeq,
      "components changed with partitioning")
    assert(m1.eigenvalues.toSeq == m13.eigenvalues.toSeq)
    val proj = Pca.project(df1, "id", "vec", m1)
      .agg(variance(col("pc1")), variance(col("pc2")), variance(col("pc3")))
      .head()
    assert(proj.getDouble(0) >= proj.getDouble(1) - 1e-6 &&
      proj.getDouble(1) >= proj.getDouble(2) - 1e-6,
      s"projection variances out of order: $proj")
  }

  test("whitened projection has ~unit variance per component") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map { i =>
      val a = rnd.nextGaussian() * 5.0; val b = rnd.nextGaussian() * 0.5
      (i.toLong, Seq((a + b).toFloat, (a - b).toFloat,
        rnd.nextGaussian().toFloat, rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("id", "vec")
    val model = Pca.fit(df, "vec", dim = 4, k = 3)
    val v = Pca.projectWhitened(df, "id", "vec", model)
      .agg(variance(col("pc1")), variance(col("pc2")), variance(col("pc3")))
      .head()
    // population eigenvalue vs sample variance differ by n/(n−1) plus
    // round-6 quantization — unit within a few percent at n=500
    (0 until 3).foreach(i => assert(math.abs(v.getDouble(i) - 1.0) < 0.05,
      s"component ${i + 1} variance ${v.getDouble(i)} not ~1 after whitening"))
  }

  test("projectedVec packs the round-6 components as float vectors") {
    val rnd = new scala.util.Random(21)
    val rows = (1 to 100).map(i =>
      (i.toLong, Seq.fill(5)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "vec")
    val model = Pca.fit(df, "vec", 5, 3)
    val packed = Pca.projectedVec(df, "id", "vec", model)
    val viaCols = Pca.project(df, "id", "vec", model)
    val joined = packed.join(viaCols, "id")
    val bad = joined.filter(
      element_at(col("pvec"), 1) =!= col("pc1").cast("float") ||
      element_at(col("pvec"), 2) =!= col("pc2").cast("float") ||
      element_at(col("pvec"), 3) =!= col("pc3").cast("float")).count()
    assert(bad == 0, "pvec disagrees with the column projection")
    assert(packed.schema("pvec").dataType.simpleString == "array<float>")
  }

  test("whitened outlier score surfaces a planted extreme point") {
    import spark.implicits._
    // tight 2D blob + one far point along the dominant axis: the
    // planted extreme must carry the largest whitened norm
    val rnd = new scala.util.Random(11)
    val blob = (1 to 80).map(i => (i.toLong,
      Seq((rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat)))
    val rows = blob :+ (999L, Seq(3.0f, 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", 2, 2)
    val p = Pca.projectWhitened(df, "vec_id", "embedding", model)
    val score = org.apache.spark.sql.functions.sqrt(
      col("pc1") * col("pc1") + col("pc2") * col("pc2"))
    val top = p.select(col("vec_id"), score.as("s"))
      .orderBy(col("s").desc).limit(1).head()
    assert(top.getLong(0) == 999L, s"expected the planted outlier, got $top")
  }
}
