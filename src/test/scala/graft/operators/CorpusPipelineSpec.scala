package graft.operators

import graft.SparkSpec

/** End-to-end training-data pipeline: every stage must visibly act on a
  * planted corpus — junk gated out, duplicate collapsed, contaminated doc
  * dropped, survivor chunked and packed. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("clean→gate→dedup→decontam→chunk→pack acts stage by stage") {
    // enough English stopwords + length to pass the quality/lang gate
    val good = ("the quick brown fox and the lazy dog it is a tale of " +
      "speed and of patience told for everyone with time to listen ") * 3
    val leaky = "the secret benchmark answer is fortytwo and it leaks " +
      "for everyone with time to listen to the tale of the quick fox"
    val docs = Seq(
      (1L, good),
      (2L, good),                     // exact duplicate → collapses into 1
      (3L, "zzz qqq xxx"),            // junk → quality/lang gate drops
      (4L, leaky)                     // overlaps benchmark → decontaminated
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      "students recall the secret benchmark answer is fortytwo and it leaks"
    ).toDF("text")

    val out = CorpusPipeline.trainingChunks(docs, benchmark,
        chunkWidth = 120, chunkOverlap = 20, packTarget = 10L)
      .select("doc_id", "chunk_idx", "chunk", "n_tokens", "bin")
      .as[(Long, Int, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

    // only doc 1 survives: dup collapsed to min id, junk gated, leak dropped
    assert(out.map(_._1).distinct == Seq(1L))
    // chunking covers the full cleaned text with width-120/stride-100 windows
    val expectChunks = math.max(1, math.ceil((good.trim.length - 20) / 100.0).toInt)
    assert(out.map(_._2) == (0 until expectChunks))
    assert(out.head._3.length == 120)
    // packing: bins are the running-token prefix divided by the target
    val runningBefore = out.map(_._4).scanLeft(0L)(_ + _).init
    assert(out.map(_._5) == runningBefore.map(_ / 10L))
  }
}
