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
    assert(s.contains("\"DepDelay\""),
      "DepDelay must dominate the importances (reference README.md:44)")
    assert(s.contains("\"within_bounds\": true"))
  }
}
