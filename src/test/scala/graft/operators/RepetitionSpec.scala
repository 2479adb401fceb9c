package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Gopher repetition-signal semantics ([[Repetition.gopherSignals]]). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: Seq[(Long, String)]) =
    Repetition.gopherSignals(rows.toDF("id", "text"), "id", "text")
      .orderBy("id").collect()

  test("duplicated lines are counted per occurrence, chars weighted") {
    // doc 1: lines "aa bb" ×2 + "cc" — dup occurrences 2/3; dup chars
    // 10 of 12 line chars
    val Array(r) = signals(Seq((1L, "aa bb\naa bb\ncc")))
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Double]("dup_line_frac") == math.round(2.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("dup_line_char_frac") == math.round(10.0 / 12 * 1e6) / 1e6)
  }

  test("top n-gram fraction is count × gram chars over doc chars") {
    // "x y x y x y": 2-grams — "x y" ×3, "y x" ×2 → top covers 3·3 = 9
    // of 11 chars; 3-grams — "x y x" ×2 ties "y x y" ×2, tie breaks by
    // gram ASC → "x y x", 2·5 = 10 of 11
    val Array(r) = signals(Seq((1L, "x y x y x y")))
    assert(r.getAs[Double]("top_2gram_frac") == math.round(9.0 / 11 * 1e6) / 1e6)
    assert(r.getAs[Double]("top_3gram_frac") == math.round(10.0 / 11 * 1e6) / 1e6)
  }

  test("dup n-gram fraction sums every duplicated gram occurrence") {
    // 7 tokens "a b c d a b c": 5-grams "a b c d a", "b c d a b",
    // "c d a b c" — all unique → dup_5gram_frac 0. A doc of one token
    // repeated 6× has a single 5-gram "t t t t t" ×2 → 2·9 / 11 chars.
    val rs = signals(Seq((1L, "a b c d a b c"), (2L, "t t t t t t")))
    assert(rs(0).getAs[Double]("dup_5gram_frac") == 0.0)
    assert(rs(1).getAs[Double]("dup_5gram_frac") == math.round(18.0 / 11 * 1e6) / 1e6)
  }

  test("short docs drop out of gram stats but keep line stats") {
    // 3 tokens: no 4/5-grams → those fracs coalesce to 0, 2/3-gram real
    val Array(r) = signals(Seq((1L, "p q p")))
    assert(r.getAs[Double]("top_4gram_frac") == 0.0)
    assert(r.getAs[Double]("dup_5gram_frac") == 0.0)
    assert(r.getAs[Double]("top_2gram_frac") > 0.0)
    assert(r.getAs[Long]("n_lines") == 1L)
  }

  test("signals are layout-independent") {
    val df = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "dup dup dup dup dup dup" else s"u$i v$i w$i x$i y$i z$i"))
      .toDF("id", "text")
    def run(parts: Int): Seq[Row] =
      Repetition.gopherSignals(df.repartition(parts), "id", "text")
        .orderBy("id").collect().toSeq
    assert(run(1) == run(7))
  }

  test("reserved working columns are rejected") {
    val e = intercept[IllegalArgumentException] {
      Repetition.gopherSignals(
        Seq((1L, "x", "y")).toDF("id", "text", "gram"), "id", "text")
    }
    assert(e.getMessage.contains("gram"))
  }
}
