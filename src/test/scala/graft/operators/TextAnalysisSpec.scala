package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish segmentation") {
    val df = Seq("hello, world 123", "", "  a  b  ").toDF("text")
      .select(
        TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // "hello, world 123" → ws: [hello,]  [world] [123] = 3;
    // bpe-ish: hello | , | world | 123 = 4
    assert(rows(0) == (3, 4))
    assert(rows(1) == (0, 0))
    assert(rows(2) == (2, 2))
  }

  test("language id picks the dominant marker language; no markers → und") {
    val df = Seq(
      (1L, "the cat and the dog sat in the house of mirrors"),
      (2L, "el perro y la casa de los gatos en la calle"),
      (3L, "qwerty asdf zxcv")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLanguageId(df, "text")
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("quality signals: ratios bounded, empty text safe, composite in [0,1]") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog and runs to the hills.",
      "",
      "!!! ??? ;;; ###"
    ).toDF("text")
    val out = TextAnalysis.withQualitySignals(df, "text")
      .select("n_tokens", "punct_ratio", "stopword_ratio", "quality_score")
      .collect()
    out.foreach { r =>
      val (p, s, q) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p >= 0 && p <= 1 && s >= 0 && s <= 1 && q >= 0 && q <= 1 + 1e-9)
    }
    val good = out(0); val junk = out(2)
    assert(good.getDouble(3) > junk.getDouble(3))
  }

  test("marker hits treat punctuation as a token boundary (regex \\b parity)") {
    // 'the,' / 'the.' / '(the)' all count; 'there' and 'the5' do not
    val df = Seq(
      (1L, "the, cat. (the) dog"),
      (2L, "there the5 theX"),
      (3L, "The THE the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLanguageId(df, "text")
      .select("doc_id", "hits_en").as[(Long, Int)].collect().toMap
    assert(out(1L) == 2, s"punct-bounded markers: got ${out(1L)}")
    assert(out(2L) == 0)
    assert(out(3L) == 3) // case-insensitive
  }

  test("fused profile agrees with the individual counters") {
    val df = Seq("The quick, brown fox! It is FAST.", "", "  a  b  ")
      .toDF("text")
    val out = TextAnalysis.withQualitySignals(df, "text")
      .select(col("n_tokens"), col("__tp.n_punct"), col("__tp.n_upper"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_ref"),
        graft.functions.TextSketches.stat(col("text"),
          graft.functions.TextStatMode.Punct).as("punct_ref"),
        graft.functions.TextSketches.stat(col("text"),
          graft.functions.TextStatMode.Upper).as("upper_ref"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(0) == r.getInt(3) && r.getInt(1) == r.getInt(4) &&
        r.getInt(2) == r.getInt(5))
    }
  }

  test("fingerprints: equal for equal text, stable, distinct for distinct text") {
    val df = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "completely different words here now ok yes")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
        TextAnalysis.fingerprint64(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
