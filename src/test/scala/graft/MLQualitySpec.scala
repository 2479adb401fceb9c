package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the per-round model-quality artifact ([[MLQuality]] writes
  * `MLQUALITY.json` from the seeded 500k reference-protocol run):
  * a FlightPipeline/FlightModel regression now fails a test AND moves a
  * tracked number, instead of hiding behind metric-tolerance suites.
  * Canceled (not passed) when the artifact has not been generated. */
class MLQualitySpec extends AnyFunSuite {

  test("MLQUALITY.json stays within the reference-published bounds") {
    val p = java.nio.file.Paths.get("MLQUALITY.json")
    assume(java.nio.file.Files.exists(p),
      "MLQUALITY.json not generated — run `runMain graft.MLQuality`")
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // measured keys appear before the "bounds" object, so first match wins
    def num(key: String): Double = {
      val m = ("\"" + key + "\": ([-0-9.eE]+)").r.findFirstMatchIn(s)
      assert(m.nonEmpty, s"missing $key in MLQUALITY.json")
      m.get.group(1).toDouble
    }
    assert(num("mae") <= MLQuality.MaeBound,
      s"MAE ${num("mae")} above the reference bound ${MLQuality.MaeBound}")
    assert(num("rmse") <= MLQuality.RmseBound,
      s"RMSE ${num("rmse")} above the reference bound ${MLQuality.RmseBound}")
    assert(num("label_accuracy") >= MLQuality.AccuracyFloor,
      s"accuracy ${num("label_accuracy")} below ${MLQuality.AccuracyFloor}")
    assert(num("prepared_rows") > 300000,
      "reference protocol must survive cleaning at ~2/3 of 500k")
    // round-8: LR baseline + CV-tuned rows are tracked too (skipped if
    // the artifact predates them, so stale-artifact runs stay canceled
    // rather than red)
    if (s.contains("\"lr_mae\"")) {
      assert(num("lr_mae") <= MLQuality.LrMaeBound,
        s"LR MAE ${num("lr_mae")} above ${MLQuality.LrMaeBound}")
      assert(num("lr_rmse") <= MLQuality.LrRmseBound,
        s"LR RMSE ${num("lr_rmse")} above ${MLQuality.LrRmseBound}")
      assert(num("cv_mae") <= MLQuality.CvMaeBound,
        s"CV MAE ${num("cv_mae")} above ${MLQuality.CvMaeBound}")
      assert(num("cv_rmse") <= MLQuality.CvRmseBound,
        s"CV RMSE ${num("cv_rmse")} above ${MLQuality.CvRmseBound}")
      assert(Set(5.0, 10.0, 15.0).contains(num("cv_best_maxDepth")) &&
        Set(20.0, 40.0, 60.0).contains(num("cv_best_maxBins")),
        "CV best params must come from the reference grid {5,10,15}×{20,40,60}")
    }
    assert(s.contains("\"DepDelay\""),
      "DepDelay must dominate the importances (reference README.md:44)")
    assert(s.contains("\"within_bounds\": true"))
  }
}
