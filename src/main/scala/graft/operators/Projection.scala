package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: shrink a d-dimensional
  * embedding to k ≪ d dimensions while approximately preserving pairwise
  * distances (the JL lemma — a RANDOM ±1 matrix works; Achlioptas 2001) —
  * the cheap first stage before ANN indexing or clustering when d is
  * large, and a 8–32× storage cut for a 100 TB vector corpus.
  *
  * The sign matrix is derived from md5(i:j:salt), not an RNG: the same
  * (dim, outDim, salt) always yields the same matrix in any engine or
  * run — reproducible like the sampling operators ([[Sampling]]'s
  * content-hash posture, applied to the projection).
  *
  * Scale shape: the matrix is a codegen reference object (dim × outDim
  * signs, a few KB — never shuffled, no driver-side vector math); each
  * row projects map-side through ONE fused expression pass
  * ([[graft.functions.JlProject]] — the zip_with/aggregate HOF form was
  * CodegenFallback, interpreted; it survives only as the parity
  * witness). No shuffle at all — the operator composes with whatever
  * comes next.
  *
  * Cross-engine reproducibility: float elements widen to double exactly,
  * a ±1 multiply is exact, terms accumulate as DECIMAL(38,9)
  * (order-independent), and the final `/sqrt(outDim)` is IEEE — rounded
  * to 6.
  */
object Projection {

  /** Deterministic ±1 sign for (i, j): MSB of md5("i:j:salt"). */
  private[operators] def signMatrix(dim: Int, outDim: Int,
      salt: String): Array[Array[Int]] =
    Array.tabulate(dim, outDim) { (i, j) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j:$salt".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1 else -1
    }

  /** Project `vecCol` (array of float/double, length `dim`) to `outDim`
    * columns appended as one array column `outCol`. */
  def randomProject(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
      salt: String = "", outCol: String = "proj"): DataFrame = {
    require(dim > 0 && outDim > 0 && outDim <= dim,
      s"need 0 < outDim <= dim, got dim=$dim outDim=$outDim")
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists — rename it in the input")
    val signs = signMatrix(dim, outDim, salt)
    df.withColumn(outCol, graft.functions.JlProject.column(
      col(vecCol).cast("array<double>"), signs, math.sqrt(outDim.toDouble)))
  }

  /** The composable HOF twin of [[randomProject]] — kept ONLY as the
    * independent parity witness for the fused expression
    * (JlProjectFusedSpec); never put this on a data-sized path:
    * zip_with/aggregate are CodegenFallback and drop the whole
    * projection to interpreted eval. */
  private[graft] def randomProjectHof(df: DataFrame, vecCol: String,
      dim: Int, outDim: Int, salt: String = "",
      outCol: String = "proj"): DataFrame = {
    val signs = signMatrix(dim, outDim, salt)
    val scale = math.sqrt(outDim.toDouble)
    val comps: Seq[Column] = (0 until outDim).map { j =>
      val sj = array((0 until dim).map(i => lit(signs(i)(j).toDouble)): _*)
      // precision 28 so the running addition keeps scale 9 (Spark widens
      // a (38,9)+(38,9) result to scale 8 — lossy); the cast back keeps
      // the accumulator type fixed, and dim·max|x| stays far inside 28
      round(
        aggregate(
          zip_with(col(vecCol).cast("array<double>"), sj, (a, s) => a * s),
          lit(java.math.BigDecimal.ZERO).cast("decimal(28,9)"),
          (acc, x) => (acc + x.cast("decimal(28,9)")).cast("decimal(28,9)"),
          acc => acc.cast("double")) / lit(scale), 6)
    }
    // the bare array(comps) would wrap a NULL input vector's null
    // components into a non-null all-null array; the contract is
    // SQL-like null-in/null-out, so the twin states it explicitly
    df.withColumn(outCol,
      when(col(vecCol).isNotNull, array(comps: _*)))
  }

  /** Generated DuckDB twin of [[randomProject]] in long form
    * (`vec_id, j, v`) over a table/CTE `srcSql` with columns
    * (vec_id, embedding) — the sign VALUES inline from the SAME
    * [[signMatrix]] computation, never hand-copied. */
  def oracleSql(srcSql: String, dim: Int, outDim: Int, salt: String): String = {
    val signs = signMatrix(dim, outDim, salt)
    val values = (for { i <- 0 until dim; j <- 0 until outDim }
      yield s"($i,$j,${signs(i)(j)})").mkString(", ")
    s"""WITH s(i, j, sg) AS (VALUES $values),
       |ex AS (
       |  SELECT vec_id,
       |    generate_subscripts(embedding, 1) - 1 AS i,
       |    unnest(embedding)::DOUBLE AS x
       |  FROM ($srcSql))
       |SELECT vec_id, CAST(j AS INTEGER) AS j,
       |  ROUND(CAST(SUM(CAST(x * sg AS DECIMAL(38,9))) AS DOUBLE)
       |        / SQRT(${outDim.toDouble}), 6) AS v
       |FROM ex JOIN s USING (i)
       |GROUP BY vec_id, j
       |ORDER BY vec_id, j""".stripMargin
  }
}
