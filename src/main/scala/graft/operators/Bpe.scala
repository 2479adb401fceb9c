package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * vocabulary-learning step of an LLM data pipeline, in the classic
  * scalable formulation: one pass over the corpus builds the word
  * FREQUENCY table (small — distinct words, not tokens), and every merge
  * iteration runs on that cached table, so 100 TB of text costs one
  * explode/aggregate and the loop's cost is bounded by vocabulary size.
  *
  * Symbol sequences are pipe-delimited strings (`|a|b|c|`) and a merge
  * (l, r) is `replace(s, "|l|r|", "|lr|")` — boundary-delimited so a
  * symbol that merely ends in `l` can never false-match. `replace` scans
  * left-to-right over non-overlapping occurrences and continues AFTER
  * each replacement; because a replacement consumes its trailing
  * delimiter, an abutting repeat (`|a|a|a|a|`) merges only its FIRST
  * pair per pass (`|aa|a|a|`) — the documented scan-greedy variant here,
  * identical in any engine with standard `replace` semantics, which is
  * what makes the whole learning loop DuckDB-oracle-able ([[oracleSql]]
  * unrolls it as chained CTEs).
  *
  * Each iteration's argmax is a 1-row collect (the iterative-driver
  * scalar pattern, like k-means centroids); ties break deterministically
  * on (count DESC, left ASC, right ASC).
  */
object Bpe {

  /** Lower-case, strip everything outside `[a-z ]` — the normalization
    * both engines reproduce bit-for-bit (multibyte text would hit
    * UTF-16-vs-codepoint char-split divergence; normalize first). */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z ]", "")

  /** `word → |w|o|r|d|` — per-char symbol string with boundary pipes. */
  private def symbolize(word: Column): Column =
    concat(lit("|"), regexp_replace(word, "(.)", "$1|"))

  /** Word-frequency table: (`s` symbol string, `freq`). ONE corpus pass;
    * merges never touch the corpus again. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(symbolize(col("w")).as("s"), col("freq"))

  /** Non-empty symbols of a pipe-delimited string. */
  private def symbols(s: Column): Column =
    filter(split(s, "[|]"), t => length(t) > 0)

  /** Learns `numMerges` merges; returns (rank, left, right, pairCount).
    * Stops early when no adjacent pair remains.
    *
    * Each round localCheckpoints the evolving symbolized word table, so
    * round k's pair count reads a lineage-CUT one-replace-deep plan
    * instead of re-deriving a k-deep replace chain from the base table
    * (O(numMerges²) replace work total, plus optimizer/plan-string cost
    * that grows with chain depth every round). localCheckpoint, not
    * cache(): an InMemoryRelation KEEPS its child plan, so per-round
    * cache() nests numMerges plan towers whose canonicalization/
    * rendering cost explodes (measured: the cached variant never
    * finished the 24-merge rung the checkpointed one does in seconds).
    * Checkpoint blocks release when the RDD is GC'd (ContextCleaner) —
    * no reference survives the loop, so a long merge run stays bounded.
    * `checkpointEvery` throttles the cadence (0 disables — the
    * measured-against baseline of the `bpe` probe rung; −1 = ADAPTIVE,
    * the default): each localCheckpoint costs a fixed job+materialize
    * overhead that dominates SHALLOW runs, while deep runs are
    * dominated by the re-derivation chains the cut removes. Measured
    * round 12 (`bpegate` probe — both arms interleaved in ONE JVM so
    * window noise cancels): the 8-merge gate runs 1.85 s uncheckpointed
    * vs 2.07 s per-round (the r11 bench's 2.3× read of this delta was
    * window noise), while the 2M-doc 24-merge rung runs 11.8 s
    * per-round vs 15.9 s uncheckpointed. Adaptive = no cuts up to 12
    * merges, per-round past that (a deliberate compromise: 24 merges
    * over a SMALL vocabulary mildly prefers uncheckpointed too — 3.65
    * vs 4.06 s — but the deep-run failure mode the cut prevents is
    * unbounded plan-tower cost, and deep runs are corpus-scale runs). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = -1): Seq[(Int, String, String, Long)] = {
    val cadence = if (checkpointEvery == -1) {
      if (numMerges <= 12) 0 else 1
    } else checkpointEvery
    val base = wordTable(docs, textCol).cache()
    var table: DataFrame = base
    table.count() // materialize before the loop
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var i = 1
    while (i <= numMerges && !done) {
      val toks = symbols(col("s"))
      val top = table
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, cnt))
        table = table.withColumn("s",
          replace(col("s"), lit(s"|$l|$r|"), lit(s"|$l$r|")))
        if (cadence > 0 && i % cadence == 0)
          table = table.localCheckpoint()
        i += 1
      }
    }
    // the merge list is driver data now — release the word-table cache
    // instead of pinning it for the session
    base.unpersist(blocking = false)
    merges.toSeq
  }

  /** Applies a learned merge list to a text column; returns the token
    * array (the TOKENIZE side of the tokenizer, same scan-greedy merge
    * semantics as [[learn]]). Pure per-row expression work — no shuffle,
    * no UDF, and (since round 12) NO higher-order functions: the whole
    * normalized document symbolizes AT ONCE (`|a|b| |c|d|` — each space
    * survives as its own one-char symbol), the merge list folds into a
    * chain of codegen'd `replace` calls over that one string, and the
    * final split drops the `""`/`" "` separators with `array_remove`.
    *
    * Whole-doc replace ≡ per-word replace: a merge pattern `|l|r|` is
    * pipes and letters only, so it can never span the space symbol
    * (the intermediate symbol would have to BE a space), matches land
    * at exactly the per-word positions, the left-to-right scan visits
    * words in order, and a replacement inside word i cannot alter word
    * j. The earlier formulation mapped a replace-fold lambda over the
    * word array — transform/filter/flatten are CodegenFallback, which
    * dropped the whole projection to interpreted dispatch (the
    * q_x_bpe_encode plan's last whitelisted lambda). */
  def segment(text: Column, merges: Seq[(String, String)]): Column = {
    val doc = concat(lit("|"), regexp_replace(normalize(text), "(.)", "$1|"))
    val merged = merges.foldLeft(doc)((s, m) =>
      replace(s, lit(s"|${m._1}|${m._2}|"), lit(s"|${m._1}${m._2}|")))
    array_remove(array_remove(split(merged, "[|]"), ""), " ")
  }

  /** The shared learning-loop CTE prefix: word table + `numMerges`
    * (pair-count, argmax, apply) stages. */
  private def loopCtes(table: String, textCol: String, numMerges: Int): Seq[String] = {
    val base =
      s"""WITH words AS (
         |  SELECT unnest(list_filter(
         |    string_split(lower(regexp_replace($textCol, '[^a-z ]', '', 'g')), ' '),
         |    x -> x <> '')) AS w
         |  FROM $table),
         |w0 AS (
         |  SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
         |         COUNT(*) AS freq
         |  FROM words GROUP BY w)""".stripMargin
    val stages = (1 to numMerges).map { k =>
      s"""p$k AS (
         |  SELECT t[i] AS l, t[i + 1] AS r,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS t,
         |               freq
         |        FROM w${k - 1}),
         |       LATERAL unnest(range(1, len(t))) u(i)
         |  GROUP BY 1, 2),
         |m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |w$k AS (
         |  SELECT replace(s, '|' || m.l || '|' || m.r || '|',
         |                    '|' || m.l || m.r || '|') AS s, freq
         |  FROM w${k - 1}, m$k m)""".stripMargin
    }
    base +: stages
  }

  /** The learning loop as `numMerges` unrolled DuckDB CTE stages — the
    * cross-engine oracle for [[learn]]. Generated, not hand-copied, so
    * the two formulations cannot drift. */
  def oracleSql(table: String, textCol: String, numMerges: Int): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT $k AS rank, l, r, cnt FROM m$k")
      .mkString("\nUNION ALL ")
    loopCtes(table, textCol, numMerges).mkString(",\n") +
      s"\n$union\nORDER BY rank"
  }

  /** The ENCODE side as DuckDB: re-learns the merge table via the same
    * loop CTEs, then applies each merge in rank order to the documents
    * matching `docFilter` and emits per-doc token counts — the
    * cross-engine oracle for [[segment]] applied after [[learn]].
    * Generated from the same parameters as the Spark query. */
  def encodeOracleSql(table: String, idCol: String, textCol: String,
      numMerges: Int, docFilter: String): String = {
    val enc = (1 to numMerges).map { k =>
      s"""e$k AS (
         |  SELECT $idCol, replace(s, '|' || m.l || '|' || m.r || '|',
         |                            '|' || m.l || m.r || '|') AS s
         |  FROM e${k - 1}, m$k m)""".stripMargin
    }
    val docCtes = Seq(
      s"""docw AS (
         |  SELECT $idCol, unnest(list_filter(
         |    string_split(lower(regexp_replace($textCol, '[^a-z ]', '', 'g')), ' '),
         |    x -> x <> '')) AS w
         |  FROM $table WHERE $docFilter),
         |e0 AS (
         |  SELECT $idCol, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s
         |  FROM docw)""".stripMargin) ++ enc
    (loopCtes(table, textCol, numMerges) ++ docCtes).mkString(",\n") +
      s"""
         |, tok AS (
         |  SELECT $idCol, unnest(list_filter(string_split(s, '|'), x -> x <> '')) AS t
         |  FROM e$numMerges)
         |SELECT $idCol, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct
         |FROM tok GROUP BY $idCol ORDER BY $idCol""".stripMargin
  }
}
