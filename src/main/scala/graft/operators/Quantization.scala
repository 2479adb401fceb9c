package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth lever for a 100 TB
  * vector corpus: a float32 embedding column shrinks 4× as int8 with
  * bounded recall loss, and the ANN candidate stages ([[Similarity]])
  * can scan the int8 form and re-rank survivors at full precision.
  *
  * Scheme: per-vector symmetric linear quantization. `scale = max|x|/127`,
  * `q_i = round(x_i / scale)` ∈ [-127, 127]; dequantization is
  * `q_i * scale`. Everything is expression-level array math
  * (`transform` / `aggregate` — codegen'd, no UDF) and map-side only: no
  * shuffle anywhere, the operator scales embarrassingly.
  *
  * All arithmetic runs in DOUBLE (float operands promote differently per
  * engine) and folds arrays in element order, so results are
  * bit-reproducible cross-engine — the property the DuckDB-oracled gate
  * checks via reconstruction error.
  */
object Quantization {

  /** Per-vector scale factor: `max|x| / 127`, in double. */
  def symmetricScale(vec: Column): Column =
    aggregate(vec.cast("array<double>"), lit(0.0),
      (acc, x) => greatest(acc, abs(x))) / lit(127.0)

  /** Int8 codes for a vector under `scale`; an all-zero vector
    * (scale = 0) quantizes to all-zero codes rather than dividing by
    * zero. */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec.cast("array<double>"),
      x => when(scale > 0, round(x / scale).cast("int")).otherwise(lit(0))
        .cast("tinyint"))

  /** Fused `quantize(vec, symmetricScale(vec))` as ONE codegen'd
    * Catalyst expression ([[graft.functions.QuantizeSymmetric]]) —
    * byte-identical output (spec-gated parity), but the HOF pair is
    * CodegenFallback in Spark and drops the whole projection to
    * interpreted per-element dispatch (~30× at the 50M probe rung; the
    * jstack was all `Divide.eval`/`RoundBase.eval`). Use THIS form on
    * anything data-sized; keep the HOF pair for à-la-carte scales and
    * as the parity oracle. */
  def quantizeFused(vec: Column): Column =
    graft.functions.VectorExprs.quantizeSymmetric(vec)

  /** Dequantized (lossy) reconstruction of int8 codes. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Mean squared reconstruction error of `vec` against its own
    * quantized form — the quality metric that decides whether int8 is
    * safe for a given embedding family. Element-order fold, double
    * accumulation. */
  def reconstructionMse(vec: Column, scale: Column): Column = {
    val v = vec.cast("array<double>")
    val err = aggregate(v, lit(0.0), (acc, x) => {
      val q = when(scale > 0, round(x / scale)).otherwise(lit(0.0))
      val d = x - q * scale
      acc + d * d
    })
    err / size(v)
  }

  /** Adds (`scale`, `codes`) columns for `vecCol`; pure map-side. */
  def withQuantized(df: DataFrame, vecCol: String,
      scaleOut: String = "scale", codesOut: String = "codes"): DataFrame = {
    val clash = df.columns.toSet.intersect(Set(scaleOut, codesOut))
    require(clash.isEmpty,
      s"withQuantized output column(s) ${clash.mkString(", ")} already exist — rename them")
    val s = symmetricScale(col(vecCol))
    df.withColumn(scaleOut, s)
      .withColumn(codesOut, quantize(col(vecCol), col(scaleOut)))
  }
}
