package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Time-decayed aggregate semantics ([[Decay.decayedStats]]). */
class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400e9.toLong
  private val asOf = 100L * day

  test("weights halve per half-life; future and null-ts rows drop") {
    val df = Seq(
      ("k", Some(asOf), Some(10.0)),            // age 0 → w 1
      ("k", Some(asOf - 2 * day), Some(10.0)),  // age 2d, hl 2d → w 0.5
      ("k", Some(asOf - 4 * day), Some(10.0)),  // age 4d → w 0.25
      ("k", Some(asOf + day), Some(99.0)),      // future → excluded
      ("k", None, Some(99.0))                   // null ts → excluded
    ).toDF("k", "ts", "v")
    val r = Decay.decayedStats(df, "k", col("ts"), "v", 2.0, asOf).first()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("decayed_sum") - 17.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("decayed_n") - 1.75) < 1e-6)
  }

  test("null values keep their weight in decayed_n but add nothing to the sum") {
    val df = Seq(
      ("k", asOf, Some(4.0)), ("k", asOf, None: Option[Double])
    ).toDF("k", "ts", "v")
    val r = Decay.decayedStats(df, "k", col("ts"), "v", 1.0, asOf).first()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("decayed_sum") == 4.0)
    assert(r.getAs[Double]("decayed_n") == 2.0)
  }

  test("refreshing asOf is a constant rescale of the stored sums") {
    val df = Seq(("k", asOf - 3 * day, 8.0), ("k", asOf - 6 * day, 2.0))
      .toDF("k", "ts", "v")
    val now = Decay.decayedStats(df, "k", col("ts"), "v", 3.0, asOf)
      .first().getAs[Double]("decayed_sum")
    val later = Decay.decayedStats(df, "k", col("ts"), "v", 3.0, asOf + 3 * day)
      .first().getAs[Double]("decayed_sum")
    // one extra half-life of age halves everything (round-9 tolerance)
    assert(math.abs(later - now / 2) < 1e-6)
  }
}
