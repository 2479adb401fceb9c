package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn finds the most frequent pair first, ties broken lexically") {
    // "ab" appears in every word; freq-weighted: (a,b) count = 3+2+1 = 6
    val docs = Seq("abc abc abc abd abd abe").toDF("text")
    val merges = Bpe.learn(docs, "text", 2)
    assert(merges.head == ((1, "a", "b", 6L)))
    // after |ab| merges, pairs are (ab,c)=3, (ab,d)=2, (ab,e)=1
    assert(merges(1) == ((2, "ab", "c", 3L)))
  }

  test("learn stops early when no pairs remain") {
    val docs = Seq("a b c a b").toDF("text")
    val merges = Bpe.learn(docs, "text", 10)
    assert(merges.isEmpty) // all words are single symbols
  }

  test("normalization strips case and punctuation before learning") {
    val docs = Seq("Ab! aB? AB.").toDF("text")
    val merges = Bpe.learn(docs, "text", 1)
    assert(merges.head == ((1, "a", "b", 3L)))
  }

  test("segment applies merges scan-greedily and round-trips the chars") {
    val docs = Seq("banana banana bandana").toDF("text")
    val merges = Bpe.learn(docs, "text", 3).map(m => (m._2, m._3))
    val toks = docs.select(Bpe.segment(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    // whatever the merges, concatenating tokens must reproduce the
    // normalized text (tokenization is a partition, never lossy)
    assert(toks.mkString == "bananabananabandana")
    // and at least one multi-char token was learned
    assert(toks.exists(_.length > 1))
    // abutting repeats: replacing |a|a| consumes the shared delimiter,
    // so ONE pass merges the first pair and leaves the rest — aaaa +
    // (a,a) is [aa, a, a]. The documented scan-greedy variant; identical
    // in DuckDB's replace, which is what the oracle relies on.
    val quad = spark.sql("SELECT 'aaaa' AS text")
      .select(Bpe.segment(col("text"), Seq(("a", "a"))).as("t"))
      .as[Seq[String]].head()
    assert(quad == Seq("aa", "a", "a"))
  }

  test("the generated oracle SQL unrolls one stage per merge") {
    val sql = Bpe.oracleSql("documents", "text", 3)
    assert(Seq("w0", "m1", "m2", "m3", "w3").forall(sql.contains))
    assert(!sql.contains("m4"))
  }
}
