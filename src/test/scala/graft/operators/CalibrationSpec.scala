package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side PAV properties — no Spark needed (the solve runs on the
  * collected config-sized bin panel). */
class CalibrationSpec extends AnyFunSuite {

  test("pavFit pools adjacent violators to their weighted mean") {
    // equal-weight rates 0.1, 0.3, 0.2, 0.4: the (0.3, 0.2) violation
    // pools to 0.25; ends untouched
    val bins = Seq((0.0, 10L, 1L), (1.0, 10L, 3L), (2.0, 10L, 2L),
      (3.0, 10L, 4L))
    assert(Calibration.pavFit(bins) == Seq(0.1, 0.25, 0.25, 0.4))
  }

  test("pavFit: weighted pooling and cascading merges") {
    // rates 1.0 (n=1), 0.0 (n=3): pooled (1+0)/(1+3) = 0.25
    assert(Calibration.pavFit(Seq((0.0, 1L, 1L), (1.0, 3L, 0L))) ==
      Seq(0.25, 0.25))
    // strictly decreasing rates collapse to one global block
    val dec = Seq((0.0, 10L, 9L), (1.0, 10L, 6L), (2.0, 10L, 3L))
    assert(Calibration.pavFit(dec) == Seq(0.6, 0.6, 0.6))
  }

  test("pavFit leaves an already-monotone sequence unchanged") {
    val mono = Seq((0.0, 5L, 1L), (1.0, 5L, 2L), (2.0, 5L, 4L))
    assert(Calibration.pavFit(mono) == Seq(0.2, 0.4, 0.8))
  }

  test("pavFit output is always non-decreasing (random panels)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val bins = (0 until 12).map(i =>
        (i.toDouble, 1L + rnd.nextInt(20).toLong, rnd.nextInt(15).toLong))
        .map { case (p, n, s) => (p, n, math.min(s, n)) }
      val fit = Calibration.pavFit(bins)
      assert(fit.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"not monotone: $fit for $bins")
      // total mass is conserved: Σ n·fit ≈ Σ s
      val mass = bins.map(_._2.toDouble).zip(fit).map(t => t._1 * t._2).sum
      assert(math.abs(mass - bins.map(_._3.toDouble).sum) < 1e-3)
    }
  }

  test("pavFit validates input") {
    intercept[IllegalArgumentException](Calibration.pavFit(Nil))
    intercept[IllegalArgumentException](
      Calibration.pavFit(Seq((0.0, 0L, 0L))))
  }
}

/** APPLY side: the step-function lookup over a fitted map, as the fused
  * [[graft.functions.StepFloorLookup]] expression (parity with the HOF
  * twin is gated separately in StepLookupFusedSpec). */
class CalibrateApplySpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val fit = Seq((0.1, 0.2), (0.3, 0.25), (0.7, 0.6))

  test("calibrateColumn is the isotonic step function with clamped ends") {
    val scores = Seq(0.05, 0.1, 0.2, 0.3, 0.69, 0.7, 0.95)
    val out = scores.toDF("s")
      .select(col("s"), Calibration.calibrateColumn(col("s"), fit).as("c"))
      .orderBy("s").as[(Double, Double)].collect().toSeq
    assert(out == Seq(
      (0.05, 0.2),  // below first threshold clamps to the first rate
      (0.1, 0.2), (0.2, 0.2),
      (0.3, 0.25), (0.69, 0.25),
      (0.7, 0.6), (0.95, 0.6))) // above last clamps to the last rate
  }

  test("calibrateColumn output is monotone in the score (random maps)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val bins = (0 until 8).map(i =>
        (i.toDouble, 1L + rnd.nextInt(9).toLong,
          rnd.nextInt(10).toLong)).map { case (p, n, s) => (p, n, math.min(s, n)) }
      val f = bins.map(_._1).zip(Calibration.pavFit(bins))
      val scores = (0 until 40).map(_ => rnd.nextDouble() * 9 - 1)
      val out = scores.toDF("s")
        .select(col("s"), Calibration.calibrateColumn(col("s"), f).as("c"))
        .orderBy("s").as[(Double, Double)].collect()
      out.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._2 <= w(1)._2, s"not monotone: ${out.toSeq}")
      }
    }
  }

  test("calibrateColumn validates the fitted map") {
    intercept[IllegalArgumentException](
      Calibration.calibrateColumn(col("s"), Nil))
    intercept[IllegalArgumentException](
      Calibration.calibrateColumn(col("s"), Seq((0.3, 0.1), (0.1, 0.2))))
  }
}
