package graft.operators

import graft.SparkSpec

/** PSI drift semantics ([[Drift.psiBins]]). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiTotal(base: Seq[Double], curr: Seq[Double],
      bins: Int = 4): Double =
    Drift.psiBins(base.toDF("v"), curr.toDF("v"), "v",
        lo = 0.0, hi = 8.0, bins = bins)
      .agg(org.apache.spark.sql.functions.sum("contrib"))
      .head().getDouble(0)

  test("identical samples score (near) zero drift") {
    val s = Seq(1.0, 3.0, 5.0, 7.0, 1.5, 3.5)
    assert(math.abs(psiTotal(s, s)) < 1e-12)
  }

  test("a shifted distribution scores large positive PSI") {
    val base = Seq.fill(50)(1.0) ++ Seq.fill(50)(3.0) // bins 0-1
    val curr = Seq.fill(50)(5.0) ++ Seq.fill(50)(7.0) // bins 2-3
    assert(psiTotal(base, curr) > 1.0) // way past the 0.25 alarm line
    // PSI of the swap is symmetric for symmetric smoothing + equal sizes
    assert(math.abs(psiTotal(base, curr) - psiTotal(curr, base)) < 1e-8)
  }

  test("every bin appears, out-of-range values clamp to edge bins") {
    val out = Drift.psiBins(
        Seq(-5.0, 100.0).toDF("v"), Seq(3.0).toDF("v"), "v",
        lo = 0.0, hi = 8.0, bins = 4)
      .orderBy("bucket").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(out(0).getAs[Long]("n_base") == 1L)   // -5 clamps into bin 0
    assert(out(3).getAs[Long]("n_base") == 1L)   // 100 clamps into bin 3
    assert(out(1).getAs[Long]("n_curr") == 1L)
    // empty-empty bin still contributes (smoothing masses differ: n=2 vs 1)
    assert(out(2).getAs[Long]("n_base") == 0L &&
      out(2).getAs[Long]("n_curr") == 0L &&
      out(2).getAs[Double]("contrib") != 0.0)
  }
}
