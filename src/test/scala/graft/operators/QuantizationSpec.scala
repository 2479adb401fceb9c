package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Int8 embedding quantization: code range, per-element error bound,
  * zero-vector handling, lossless round-trip structure. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Seq(0.5f, -1.0f, 0.25f, 0.75f)),
    (2L, Seq(100.0f, -50.0f, 0.0f, 12.5f)),
    (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero vector
  ).toDF("id", "v")

  test("codes stay in [-127, 127] and extremes map to ±127") {
    val rows = Quantization.withQuantized(df, "v")
      .select(col("id"), col("codes"))
      .as[(Long, Seq[Byte])].collect().toMap
    rows.values.foreach(cs => cs.foreach(c => assert(c >= -127 && c <= 127)))
    assert(rows(1L).min == -127) // -1.0 is vector 1's max magnitude
    assert(rows(2L).max == 127)  // 100.0 is vector 2's max magnitude
  }

  test("per-element reconstruction error is bounded by scale/2") {
    val rows = Quantization.withQuantized(df.filter(col("id") =!= 3L), "v")
      .select(col("id"), col("v").cast("array<double>"), col("scale"),
        Quantization.dequantize(col("codes"), col("scale")))
      .as[(Long, Seq[Double], Double, Seq[Double])].collect()
    rows.foreach { case (id, v, scale, deq) =>
      v.zip(deq).foreach { case (x, d) =>
        assert(math.abs(x - d) <= scale / 2 + 1e-12,
          s"vector $id: |$x - $d| > scale/2 = ${scale / 2}")
      }
    }
  }

  test("the all-zero vector quantizes to zero codes, not a divide-by-zero") {
    val r = Quantization.withQuantized(df.filter(col("id") === 3L), "v")
      .select(col("scale"), col("codes"))
      .as[(Double, Seq[Byte])].collect().head
    assert(r._1 == 0.0)
    assert(r._2.forall(_ == 0))
  }

  test("reconstructionMse matches a driver-side recomputation") {
    val r = df.filter(col("id") === 1L)
      .select(Quantization.reconstructionMse(col("v"),
        Quantization.symmetricScale(col("v"))))
      .as[Double].collect().head
    val v = Seq(0.5f, -1.0f, 0.25f, 0.75f).map(_.toDouble)
    val scale = v.map(math.abs).max / 127.0
    val expected = v.map { x =>
      val d = x - math.round(x / scale) * scale; d * d
    }.sum / v.size
    assert(math.abs(r - expected) < 1e-12)
  }

  test("output-name collisions are rejected") {
    assertThrows[IllegalArgumentException] {
      Quantization.withQuantized(df.withColumn("codes", lit(1)), "v")
    }
  }
}
