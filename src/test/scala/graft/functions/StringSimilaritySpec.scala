package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Linkage

/** Jaro-Winkler semantics: textbook values, the DuckDB-pinned empty
  * convention, null passthrough, and the linkage operator's blocking. */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinklerImpl(a, b)

  test("textbook pairs reproduce the published values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
  }

  test("identity is 1; disjoint is 0; either-empty is 0 (DuckDB rule)") {
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0) // NOT 1 — pinned to the oracle's convention
  }

  test("winkler boost applies only above 0.7 and caps the prefix at 4") {
    // transposed tail, shared 6-prefix: m=8, t=1 → jaro 23/24; the
    // boost must use l=4 (cap), not the actual 6-char common prefix
    val jaro = (1.0 + 1.0 + 7.0 / 8) / 3.0
    val expect = jaro + 4 * 0.1 * (1.0 - jaro)
    assert(math.abs(jw("prefixab", "prefixba") - expect) < 1e-15)
    // below the 0.7 threshold no boost despite a shared first char
    val lo = jw("axyzw", "avuts")  // m=1 → jaro (1/5+1/5+1)/3 ≈ 0.4667
    assert(math.abs(lo - (1.0 / 5 + 1.0 / 5 + 1.0) / 3.0) < 1e-15)
  }

  test("the column expression evaluates inside a plan and skips nulls") {
    val df = Seq(("martha", "marhta"), ("abc", null))
      .toDF("a", "b")
      .select(StringSimilarityExprs.jaroWinkler(col("a"), col("b")).as("jw"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(rows(1).isNullAt(0))
  }

  test("jaroWinklerPairs blocks on first token and thresholds") {
    val df = Seq(
      (1L, "acme corp ltd"), (2L, "acme corp inc"),   // same block, close
      (3L, "acme corporation holdings intl"),          // same b1, other length bucket
      (4L, "zenith corp ltd"))                         // different block
      .toDF("id", "name")
    val got = Linkage.jaroWinklerPairs(df, "id", "name", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 3 blocks away by length; 4 by token
  }
}
