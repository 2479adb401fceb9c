package graft.operators

import graft.SparkSpec

/** CUPED semantics: expectation preserved, variance explained by the
  * covariate removed, degenerate covariate handled. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("adjustment corrects a finite-sample covariate imbalance") {
    // near-randomized: a drew the odd X values, b the even ones — a
    // 1-unit accidental X̄ gap. Y = X + 5·1{a}: the raw gap reads 4,
    // the CUPED-adjusted gap recovers the true effect ≈ 5.
    val rows =
      (1 to 50).map(i => ("a", (2 * i - 1).toDouble, (2 * i - 1) + 5.0)) ++
      (1 to 50).map(i => ("b", (2 * i).toDouble, (2 * i).toDouble))
    val out = Experiment.cupedAdjust(rows.toDF("v", "x", "y"), "v", "y", "x")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean_y"), r.getAs[Double]("mean_y_adj"))).toMap
    val rawGap = out("a")._1 - out("b")._1
    val adjGap = out("a")._2 - out("b")._2
    assert(math.abs(rawGap - 4.0) < 1e-6) // biased by the X̄ imbalance
    assert(math.abs(adjGap - 5.0) < 0.05) // the true effect
  }

  test("theta is cov/var and var_ratio is 1 - rho^2") {
    // Y perfectly linear in X → theta = slope, var_ratio ≈ 0
    val rows = (1 to 40).map(i => ("v", i.toDouble, 3.0 * i + 7))
    val r = Experiment.cupedAdjust(rows.toDF("v", "x", "y"), "v", "y", "x")
      .head()
    assert(math.abs(r.getAs[Double]("theta") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_ratio")) < 1e-6)
  }

  test("grand mean of adjusted values equals the raw grand mean") {
    val rows = (1 to 30).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 7).toDouble, (i % 5 + i % 3).toDouble))
    val out = Experiment.cupedAdjust(rows.toDF("v", "x", "y"), "v", "y", "x")
      .collect()
    val n = out.map(_.getAs[Long]("n")).sum.toDouble
    val raw = out.map(r => r.getAs[Double]("mean_y") * r.getAs[Long]("n")).sum / n
    val adj = out.map(r => r.getAs[Double]("mean_y_adj") * r.getAs[Long]("n")).sum / n
    assert(math.abs(raw - adj) < 1e-5) // θ·Σ n_v·(x̄_v − x̄) = 0
  }
}
