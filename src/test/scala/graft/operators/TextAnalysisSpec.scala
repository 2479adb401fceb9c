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

  test("language id classifies UNSEGMENTED Chinese via the char-level fallback") {
    val df = Seq(
      (1L, "这是一个没有空格的中文测试文档他说的话我不在乎"), // no whitespace at all
      (2L, "这是 一个 的 文档"),                              // pre-segmented
      (3L, "the quick fox 的 and the dog")                    // mixed: en dominates
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLanguageId(df, "text")
      .select("doc_id", "lang_guess", "hits_zh")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "zh", s"unsegmented zh misclassified: ${out(1L)}")
    // marker chars in doc 1: 这,是,的,他,的,我,不,在 → count as substrings
    assert(out(1L)._2 == "这是一个没有空格的中文测试文档他说的话我不在乎"
      .count("的了是我不在有人这他".toSet))
    assert(out(2L)._1 == "zh")
    assert(out(3L)._1 == "en")
    assert(out(3L)._2 == 1) // the lone ideograph still counts
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

  test("vocabulary: tf, exact df, and idf from the corpus count") {
    val df = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(v("a") == ((3L, 2L, math.rint(math.log(3.0 / 2) * 1e6) / 1e6)))
    assert(v("b") == ((1L, 1L, math.rint(math.log(3.0) * 1e6) / 1e6)))
    assert(v("c") == ((4L, 2L, math.rint(math.log(3.0 / 2) * 1e6) / 1e6)))
  }

  test("vocabularySketched: sparse-range df is EXACT; dense df inside the " +
    "HLL error bound; tf always exact") {
    // one word in every doc (high df), one rare word: 30k docs pushes
    // "hot" far past lgConfigK=12's sparse range (~1k), "rare" stays in it
    val n = 30000L
    val docs = spark.range(n).selectExpr("id AS doc_id",
      "CASE WHEN id = 0 THEN 'hot rare' ELSE 'hot' END AS text")
    val v = TextAnalysis.vocabularySketched(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (hotTf, hotDf, _) = v("hot")
    assert(hotTf == n) // tf is a plain count — exact regardless of df
    // RSE at lgK=12 is 1.04/sqrt(4096) ~ 1.6%; 3 sigma ~ 5%
    assert(math.abs(hotDf - n).toDouble / n < 0.05,
      s"hot df estimate $hotDf outside 5% of $n")
    assert(v("rare") == ((1L, 1L, math.rint(math.log(n.toDouble) * 1e6) / 1e6)))
    // at small df the sketch stores exact coupons — off only on rare
    // 26-bit coupon collisions (this seeded 500-doc word has none)
    val small = spark.range(500).selectExpr("id AS doc_id", "'w' AS text")
    val sv = TextAnalysis.vocabularySketched(small, "doc_id", "text").collect()
    assert(sv.head.getLong(2) == 500L)
  }

  test("topBigramFraction: repeated bigram dominates; 1-token docs drop out") {
    val df = Seq(
      (1L, "x y x y x y"),   // bigrams: xy yx xy yx xy → top 'x y' 3/5
      (2L, "a b c"),         // ab bc → 1/2
      (3L, "solo")           // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topBigramFraction(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((0.6, 5L)), 2L -> ((0.5, 2L))))
  }

  test("scrubPii redacts emails before phones and counts both") {
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org or call +1 555 123 4567 now",
      "no pii here at all",
      "two mails a@b.io c@d.org and digits 555-867-5309"
    ).toDF("text")
    val (ne, np) = TextAnalysis.piiCounts(col("text"))
    val rows = df.select(TextAnalysis.scrubPii(col("text")).as("s"),
        ne.as("ne"), np.as("np"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows(0) == (("mail me at <EMAIL> or call <PHONE> now", 1, 1)))
    assert(rows(1) == (("no pii here at all", 0, 0)))
    assert(rows(2) == (("two mails <EMAIL> <EMAIL> and digits <PHONE>", 2, 1)))
  }

  test("sampleBy strata respect their target fractions") {
    val df = spark.range(0, 4000)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS k")
    val n = df.stat.sampleBy("k", Map("a" -> 0.5, "b" -> 0.1), 42L)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(math.abs(n("a") / 2000.0 - 0.5) < 0.05, s"stratum a: ${n("a")}")
    assert(math.abs(n("b") / 2000.0 - 0.1) < 0.05, s"stratum b: ${n("b")}")
  }

  test("chunkDocuments: overlapping windows cover the text; blank doc = 1 chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        width = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // stride 2: starts 0,2,4,6 → "abcd","cdef","efgh","ghij" (ceil((10-2)/2)=4)
    assert(chunks == Map(
      (1L, 0) -> "abcd", (1L, 1) -> "cdef", (1L, 2) -> "efgh", (1L, 3) -> "ghij",
      (2L, 0) -> "abc", (3L, 0) -> ""))
    // overlap property: chunk i's tail == chunk i+1's head
    assert(chunks((1L, 0)).takeRight(2) == chunks((1L, 1)).take(2))
  }

  test("packBins: running token count splits groups at the target") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 300L), (4L, "g", 50L),
      (5L, "h", 600L)
    ).toDF("doc_id", "grp", "n_tokens")
    val bins = TextAnalysis.packBins(df, "grp", "doc_id", "n_tokens", 500L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // g: before-counts 0,300,600,900 → bins 0,0,1,1; h: 0 → 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("packSpans: docs split across exactly-full sequences; spans cover every token") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 650L), (4L, "g", 50L),
      (5L, "h", 499L), (6L, "h", 1L), (7L, "h", 1L),
      (8L, "z", 0L) // zero-token doc occupies no span
    ).toDF("doc_id", "grp", "n_tokens")
    val spans = TextAnalysis.packSpans(df, "grp", "doc_id", "n_tokens", 500L)
      .select("doc_id", "grp", "n_tokens", "seq_id", "tok_start", "tok_end")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq.sorted
    // doc 1: [0,300) → seq 0 full span; doc 2: [300,600) splits 0/1;
    // doc 3: [600,1250) spans seqs 1,2; doc 4: [1250,1300) seq 2
    assert(spans.filter(_._2 == "g") == Seq(
      (1L, "g", 300L, 0L, 0L, 300L),
      (2L, "g", 300L, 0L, 0L, 200L), (2L, "g", 300L, 1L, 200L, 300L),
      (3L, "g", 650L, 1L, 0L, 400L), (3L, "g", 650L, 2L, 400L, 650L),
      (4L, "g", 50L, 2L, 0L, 50L)))
    // h: 499+1 fill seq 0 exactly; doc 7 starts seq 1
    assert(spans.filter(_._2 == "h") == Seq(
      (5L, "h", 499L, 0L, 0L, 499L), (6L, "h", 1L, 0L, 0L, 1L),
      (7L, "h", 1L, 1L, 0L, 1L)))
    assert(!spans.exists(_._1 == 8L))
    // token-conservation: per doc, Σ span lengths == n_tokens
    spans.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(s => s._6 - s._5).sum == ss.head._3)
    }
    // every sequence but each group's LAST is exactly full
    val perSeq = spans.groupBy(s => (s._2, s._4))
      .view.mapValues(_.map(s => s._6 - s._5).sum).toMap
    perSeq.foreach { case ((g, seq), tot) =>
      val last = perSeq.keys.filter(_._1 == g).map(_._2).max
      if (seq < last) assert(tot == 500L, s"($g, $seq) not full: $tot")
      else assert(tot <= 500L)
    }
  }

  test("packSpans: layout-invariant and validates its contracts") {
    val rnd = new scala.util.Random(5)
    val df = (1L to 200L).map(i => (i, i % 4, 1L + rnd.nextInt(700).toLong))
      .toDF("doc_id", "grp", "n_tokens")
    val a = TextAnalysis.packSpans(df, "grp", "doc_id", "n_tokens", 256L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = TextAnalysis.packSpans(df.repartition(7), "grp", "doc_id",
      "n_tokens", 256L).collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.packSpans(df, "grp", "doc_id", "n_tokens", 0L)
    }
    assertThrows[IllegalArgumentException] {
      TextAnalysis.packSpans(df.withColumn("seq_id", lit(1)),
        "grp", "doc_id", "n_tokens", 256L)
    }
  }

  test("cleanText: NFC-composes, strips controls, collapses whitespace") {
    val messy = "Cafe\u0301 \u0007 \t xy  nai\u0308ve "
    val out = Seq(messy).toDF("text")
      .select(TextAnalysis.cleanText(col("text")).as("c"),
        length(col("text")).as("raw"), length(TextAnalysis.cleanText(col("text"))).as("n"))
      .head()
    assert(out.getString(0) == "Caf\u00e9 xy na\u00efve")
    // é and ï composed: 2 chars shorter; controls/extra ws gone
    assert(out.getInt(2) == "Caf\u00e9 xy na\u00efve".length)
    // already-clean text passes through unchanged
    val clean = Seq("already clean text").toDF("text")
      .select(TextAnalysis.cleanText(col("text"))).head().getString(0)
    assert(clean == "already clean text")
  }

  test("charEntropy: uniform > skewed > constant; codepoint-counted; empty = 0") {
    val out = Seq("abcd", "aab", "aaaa", "", "中中文文")
      .toDF("text")
      .select(TextAnalysis.charEntropy(col("text")).as("h"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(out(0) - math.log(4)) < 1e-12)           // 4 distinct, uniform
    val skew = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(out(1) - skew) < 1e-12)
    assert(out(2) == 0.0)                                    // constant text
    assert(out(3) == 0.0)                                    // empty text
    assert(math.abs(out(4) - math.log(2)) < 1e-12)           // CJK codepoints
  }

  test("splitSentences keeps terminators and indexes sentences per doc") {
    val df = Seq((1L, "First one. Second two! Third three? tail"),
      (2L, "no terminators at all")).toDF("doc_id", "text")
    val out = TextAnalysis.splitSentences(df, "doc_id", "text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0, "First one."), (1L, 1, "Second two!"),
      (1L, 2, "Third three?"), (1L, 3, "tail"),
      (2L, 0, "no terminators at all")))
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

  test("percentileGate keeps each group's own upper quantile") {
    // group a: scores 1..8 → p25 cuts the bottom quarter (1, 2);
    // group b: scores 101..104 — its OWN p25 cuts 101, not a global one
    val df = ((1 to 8).map(i => ("a", i.toLong, i.toLong)) ++
      (101 to 104).map(i => ("b", i.toLong, i.toLong)))
      .toDF("src", "id", "score")
    val kept = TextAnalysis.percentileGate(df, Seq("src"), "score", "id", 0.25)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(kept.filter(_._1 == "a").map(_._3) == Seq(3L, 4L, 5L, 6L, 7L, 8L))
    assert(kept.filter(_._1 == "b").map(_._3) == Seq(102L, 103L, 104L))
  }

  test("percentileGate: small groups degrade proportionally, never vanish") {
    // singleton survives ANY minPct < 1 (rank/n = 1.0), where the old
    // percent_rank formulation scored it 0.0 and deleted it outright
    val solo = Seq(("solo", 1L, 42L)).toDF("src", "id", "score")
    assert(TextAnalysis.percentileGate(solo, Seq("src"), "score", "id", 0.0)
      .count() == 1)
    assert(TextAnalysis.percentileGate(solo, Seq("src"), "score", "id", 0.9)
      .count() == 1)
    // an n=2 group at minPct=0.25 keeps BOTH rows (floor(0.25*2) = 0 to
    // drop); only at minPct >= 0.5 does it lose its lower row
    val pair = Seq(("p", 1L, 10L), ("p", 2L, 20L)).toDF("src", "id", "score")
    assert(TextAnalysis.percentileGate(pair, Seq("src"), "score", "id", 0.25)
      .count() == 2)
    val kept = TextAnalysis.percentileGate(pair, Seq("src"), "score", "id", 0.5)
      .as[(String, Long, Long)].collect()
    assert(kept.map(_._3).toSeq == Seq(20L))
  }

  test("percentileGate rejects inputs that carry its reserved columns") {
    val df = Seq(("a", 1L, 2L, 3L)).toDF("src", "id", "score", "__rk")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.percentileGate(df, Seq("src"), "score", "id", 0.25)
    }
  }

  test("bigramPerplexity scores the add-1 bigram model exactly") {
    // corpus: unigrams a=3 b=3 x=1, V=3; bigrams "a b"=3, "b a"=1
    // p(b|a) = (3+1)/(3+3) = 2/3, p(a|b) = (1+1)/(3+3) = 1/3
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: bigrams {a b: 2, b a: 1} → H = −(2·ln(2/3) + ln(1/3)) / 3
    val h1 = -(r12(2 * math.log(2.0 / 3)) + r12(math.log(1.0 / 3))) / 3
    // doc 2: one bigram at p = 2/3 → perplexity exactly 1/p = 1.5
    val h2 = -r12(math.log(2.0 / 3))
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 3L), (2L, 1L)),
      "doc 3 has no bigram and must drop out")
    assert(out.map(_._3) == Seq(r6(h1), r6(h2)))
    assert(out.map(_._4) == Seq(r6(math.exp(h1)), r6(math.exp(h2))))
    assert(out(1)._4 == 1.5)
  }

  test("bigramPerplexity rejects reserved column names") {
    val df = Seq((1L, "a b", "clash")).toDF("doc_id", "text", "w1")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.bigramPerplexity(df, "doc_id", "text")
    }
  }

  test("pmiCollocations scores association and orders by it") {
    // corpus "x x", "x y": unigrams x:3 y:1 (N=4); bigrams (x,x):1 (x,y):1
    // (Nb=2) → pmi(x,y)=ln(16/6)≈0.980829 > pmi(x,x)=ln(16/18)≈-0.117783
    val docs = Seq("x x", "x y").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("x", "y", 1L, 0.980829),
      ("x", "x", 1L, -0.117783)))
  }

  test("pmiCollocations minCount prunes and reserved names are rejected") {
    val docs = Seq("x x", "x y").toDF("text")
    assert(TextAnalysis.pmiCollocations(docs, "text", minCount = 2).count() == 0)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.pmiCollocations(Seq(("t", "w1")).toDF("text", "w1"), "text")
    }
  }

  // ───────────────────── topTerms ─────────────────────

  test("topTerms ranks rare high-tf terms above ubiquitous ones") {
    // "the" appears in all docs (idf = ln(1) = 0); "zebra" only in doc 1
    val docs = Seq(
      (1L, "the the the zebra zebra quark"),
      (2L, "the lion"),
      (3L, "the lion quark")
    ).toDF("id", "text")
    val got = TextAnalysis.topTerms(docs, "id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Double)].collect()
    val doc1 = got.filter(_._1 == 1L)
    // zebra: tf 2 · ln(3) beats quark: tf 1 · ln(3/2); "the" scores 0
    assert(doc1.map(_._3).toSeq == Seq("zebra", "quark"))
    assert(doc1.head._4 == 2L)
    // zero-idf "the" can fill a short doc's tail but never ranks first
    assert(got.filter(_._2 == 1).forall(_._3 != "the"))
    // ranks are 1-based and dense within a doc
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(1, 2))
  }

  test("topTerms ties break alphabetically at equal score") {
    val docs = Seq((1L, "b a"), (2L, "c d")).toDF("id", "text")
    val got = TextAnalysis.topTerms(docs, "id", "text", k = 1)
      .orderBy("doc_id").as[(Long, Int, String, Long, Double)].collect()
    // within doc 1, a and b tie (tf 1, same idf) → 'a' wins rank 1
    assert(got.head._3 == "a" && got(1)._3 == "c")
  }

  test("hashedBagOfWords: signed counts per bucket, sparse, stable") {
    import spark.implicits._
    val docs = Seq((1L, "alpha alpha beta"), (2L, "alpha"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedBagOfWords(docs, "doc_id", "text", 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // same token always lands in the same bucket with the same sign:
    // doc 1's alpha weight is exactly twice doc 2's
    val alphaW = out.collect { case ((2L, b), w) => (b, w) }.toSeq
    assert(alphaW.size == 1)
    val (alphaBucket, w2) = alphaW.head
    assert(out((1L, alphaBucket)) == 2 * w2)
    assert(math.abs(w2) == 1)
    // empty doc contributes nothing
    assert(!out.keys.exists(_._1 == 3L))
    // repartitioned input gives identical output
    val re = TextAnalysis.hashedBagOfWords(docs.repartition(5),
      "doc_id", "text", 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == out)
  }
}
