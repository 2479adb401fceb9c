package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TopKWindowRewrite — the optimizer rule turning the row_number()<=k
  * window idiom into the bounded-heap TopKAgg aggregate. The test
  * session activates `graft.functions.GraftExtensions` (like every
  * driver-contract session), so the rule fires during normal
  * optimization; row-for-row equivalence is checked against the SAME
  * window WITHOUT the filter (which the rule cannot touch), filtered on
  * the driver. */
class TopKWindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(0, 5000)
    .selectExpr("id", "id % 5 AS g",
      "CAST((id * 37) % 1000 AS DOUBLE) AS v",
      "CASE WHEN id % 97 = 0 THEN NULL ELSE CAST(id % 31 AS DOUBLE) END AS nv")
    .repartition(7)

  /** Ground truth: run the window UNREWRITTEN (no filter on rn → the
    * rule's Filter-over-Window shape never forms), filter driver-side. */
  private def windowTruth(df: DataFrame, rnMax: Int): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
      .filter(_.last.asInstanceOf[Int] <= rnMax)
      .sortBy(_.toString)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrites filter-over-row_number into TopKAgg with identical rows") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val plan = planOf(df)
    assert(plan.contains("top_k") && !plan.contains("Window"),
      s"session did not rewrite the idiom:\n$plan")
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == windowTruth(data.withColumn("rn", row_number().over(w)), 4))
  }

  test("null primaries rank last, exactly like DESC NULLS LAST") {
    // k large enough that null-ord rows make the cut in small groups
    val w = Window.partitionBy("g").orderBy(col("nv").desc, col("id").desc)
    val small = data.filter(col("id") < 300)
    val df = small.withColumn("rn", row_number().over(w)).filter(col("rn") <= 70)
    assert(planOf(df).contains("top_k"))
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == windowTruth(small.withColumn("rn", row_number().over(w)), 70))
  }

  test("null primary ranks strictly below -Infinity (exact NULLS LAST)") {
    // the heap's null key sits BELOW -Inf's sortable embedding — a null
    // must never tie with a real -Inf (DESC NULLS LAST puts -Inf first)
    val rows = Seq((Some(Double.NegativeInfinity), 1L), (None, 2L),
      (Some(1.0), 3L)).toDF("v", "id").withColumn("g", lit("x")).repartition(2)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val df = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(planOf(df).contains("top_k"))
    assert(df.orderBy("rn").select("id").as[Long].collect().toSeq == Seq(3L, 1L))
  }

  test("NaN ranks greatest and -0.0 ties 0.0, matching Spark's double order") {
    val rows = Seq((Double.NaN, 1L), (Double.PositiveInfinity, 2L), (5.0, 3L),
      (-0.0, 4L), (0.0, 5L)).toDF("v", "id")
      .withColumn("g", lit("x")).repartition(2)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val df = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    assert(planOf(df).contains("top_k"))
    // NaN > +Inf > 5.0 > {−0.0, 0.0} tied → id ASC breaks: 4 before 5
    assert(df.orderBy("rn").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("rewrites the dominant (score DESC, id ASC) tie idiom via bitwise-not") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val plan = planOf(df)
    assert(plan.contains("top_k") && !plan.contains("Window"),
      s"session did not rewrite the ASC-tie idiom:\n$plan")
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == windowTruth(data.withColumn("rn", row_number().over(w)), 4))
  }

  test("ASC tie is exact at the Long extremes (bitwise NOT, not negation)") {
    // Long.MinValue would survive a negation-based reversal WRONGLY
    // (−MinValue wraps to itself); ~x has no such edge
    val extremes = Seq(
      (Long.MinValue, "g", 5.0), (Long.MinValue + 1, "g", 5.0),
      (-1L, "g", 5.0), (0L, "g", 5.0), (1L, "g", 5.0),
      (Long.MaxValue - 1, "g", 5.0), (Long.MaxValue, "g", 5.0),
      (42L, "g", 9.0))
      .toDF("id", "g", "v").repartition(3)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val df = extremes.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    assert(planOf(df).contains("top_k"))
    // rank 1 is the v=9 row; ranks 2-4 are the SMALLEST ids at v=5
    val got = df.orderBy("rn").select("id").as[Long].collect().toSeq
    assert(got == Seq(42L, Long.MinValue, Long.MinValue + 1, -1L))
  }

  test("rewrites a non-nullable LONG primary, exact above 2^53") {
    // ids-as-scores / timestamps / counters: the most common top-k
    // primary. 2^53 and 2^53+1 collide in a double embedding — the
    // long-keyed heap must separate them.
    val big = 1L << 53
    val rows = Seq((big + 1, "a", 1), (big, "a", 2), (big - 1, "a", 3),
      (7L, "b", 4), (9L, "b", 5)).toDF("score", "g", "id").repartition(3)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    // parquet-style nullable long would NOT fire; coalesce proves non-null
    val nn = rows.withColumn("score", coalesce(col("score"), lit(Long.MinValue)))
    val df = nn.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val plan = planOf(df)
    assert(plan.contains("top_k") && !plan.contains("Window"),
      s"non-nullable long primary did not rewrite:\n$plan")
    val got = df.orderBy("g", "rn").select("score", "g", "rn")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((big + 1, "a", 1), (big, "a", 2), (9L, "b", 1), (7L, "b", 2)))
  }

  test("long primary at the Long extremes (raw keys, no double round-trip)") {
    val rows = Seq((Long.MaxValue, 1), (Long.MaxValue - 1, 2),
      (Long.MinValue, 3), (Long.MinValue + 1, 4), (0L, 5))
      .toDF("score", "id").withColumn("g", lit("x")).repartition(3)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val df = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(planOf(df).contains("top_k"))
    val got = df.orderBy("rn").select("score").as[Long].collect().toSeq
    assert(got == Seq(Long.MaxValue, Long.MaxValue - 1, 0L))
  }

  test("rewrites the FIRST-k idiom: ASC non-nullable integral primary") {
    // "first k rows per user" (contribution capping, session heads) —
    // the primary feeds the heap as ~x, so the k SMALLEST rank first
    val w = Window.partitionBy("g").orderBy(col("id").asc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = planOf(df)
    assert(plan.contains("top_k") && !plan.contains("Window"),
      s"ASC integral primary did not rewrite:\n$plan")
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == windowTruth(data.withColumn("rn", row_number().over(w)), 3))
  }

  test("ASC primary is exact at the Long extremes") {
    val rows = Seq((Long.MinValue, 1), (Long.MinValue + 1, 2), (-1L, 3),
      (0L, 4), (Long.MaxValue - 1, 5), (Long.MaxValue, 6))
      .toDF("score", "id").withColumn("g", lit("x")).repartition(3)
    val w = Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)
    val df = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(planOf(df).contains("top_k"))
    assert(df.orderBy("rn").select("score").as[Long].collect().toSeq ==
      Seq(Long.MinValue, Long.MinValue + 1, -1L))
  }

  test("does not fire on shapes it cannot prove equivalent") {
    // ascending DOUBLE primary (no lossless reversal preserves NaN)
    val wAsc = Window.partitionBy("g").orderBy(col("v").asc)
    val asc = data.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 3)
    assert(planOf(asc).contains("Window"))
    // ascending NULLABLE integral primary (NULLS FIRST would matter)
    val wAscN = Window.partitionBy("g")
      .orderBy(when(col("id") % 97 === 0, lit(null))
        .otherwise(col("id")).cast("long").asc)
    val ascN = data.withColumn("rn", row_number().over(wAscN)).filter(col("rn") <= 3)
    assert(planOf(ascN).contains("Window"))
    // NULLABLE long primary (the heap's null sentinel is a real long —
    // Long.MinValue data could collide with a null's rank)
    val wLong = Window.partitionBy("g")
      .orderBy(when(col("id") % 97 === 0, lit(null)).otherwise(col("id"))
        .cast("long").desc)
    val lng = data.withColumn("rn", row_number().over(wLong)).filter(col("rn") <= 3)
    assert(planOf(lng).contains("Window"))
    // percent_rank() — no bounded-buffer form exists (needs group size)
    val wRank = Window.partitionBy("g").orderBy(col("v").desc)
    val prk = data.withColumn("rn", percent_rank().over(wRank))
      .filter(col("rn") <= 0.1)
    assert(planOf(prk).contains("Window"))
    // rank() over an ascending DOUBLE primary — same NaN-reversal hole
    val rnkAsc = data.withColumn("rn", rank().over(wAsc)).filter(col("rn") <= 3)
    assert(planOf(rnkAsc).contains("Window"))
  }

  // ──────────────── rank() / dense_rank() (ties-aware) ────────────────

  test("rewrites rank()<=k with MORE than k rows surviving at a tied boundary") {
    // v has duplicates (id*37 % 1000 over 5000 ids → each value ~5×):
    // ties at the k-th boundary must ALL survive — the exact semantics
    // row_number's heap cannot express
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = data.withColumn("rn", rank().over(w)).filter(col("rn") <= 4)
    val plan = planOf(df)
    assert(plan.contains("rank_top_k") && !plan.contains("Window"),
      s"session did not rewrite the rank idiom:\n$plan")
    val truth = windowTruth(data.withColumn("rn", rank().over(w)), 4)
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == truth)
    // the ties-aware guarantee actually exercised: some group emits > k
    val perGroup = df.groupBy("g").count().as[(Long, Long)].collect()
    assert(perGroup.exists(_._2 > 4),
      s"fixture has no boundary tie — per-group counts: ${perGroup.toSeq}")
  }

  test("rank values SKIP after ties (competition ranking), exactly like the window") {
    val rows = Seq(("a", 9.0, 1L), ("a", 9.0, 2L), ("a", 7.0, 3L),
      ("a", 7.0, 4L), ("a", 5.0, 5L), ("b", 1.0, 6L))
      .toDF("g", "v", "id").repartition(3)
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = rows.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    assert(planOf(df).contains("rank_top_k"))
    // a-group: 9.0→rank 1,1; 7.0→rank 3,3 (skips 2); 5.0→rank 5 > 3 OUT
    val got = df.orderBy("g", "rn", "id").select("g", "id", "rn")
      .as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("a", 1L, 1), ("a", 2L, 1), ("a", 3L, 3),
      ("a", 4L, 3), ("b", 6L, 1)))
  }

  test("rewrites dense_rank()<=k keeping ALL rows of the k largest distinct keys") {
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = data.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 3)
    val plan = planOf(df)
    assert(plan.contains("dense_rank_top_k") && !plan.contains("Window"),
      s"session did not rewrite the dense_rank idiom:\n$plan")
    val truth = windowTruth(data.withColumn("rn", dense_rank().over(w)), 3)
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == truth)
  }

  test("dense_rank does NOT skip after ties") {
    val rows = Seq(("a", 9.0, 1L), ("a", 9.0, 2L), ("a", 7.0, 3L),
      ("a", 5.0, 4L), ("a", 3.0, 5L)).toDF("g", "v", "id").repartition(2)
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = rows.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 3)
    assert(planOf(df).contains("dense_rank_top_k"))
    val got = df.orderBy("rn", "id").select("id", "rn")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1), (2L, 1), (3L, 2), (4L, 3)))
  }

  test("rank: null primaries are PEERS ranking last together (NULLS LAST)") {
    val w = Window.partitionBy("g").orderBy(col("nv").desc)
    val small = data.filter(col("id") < 400)
    val df = small.withColumn("rn", rank().over(w)).filter(col("rn") <= 60)
    assert(planOf(df).contains("rank_top_k"))
    val truth = windowTruth(small.withColumn("rn", rank().over(w)), 60)
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == truth)
  }

  test("rank over a two-key order: ties require BOTH keys equal") {
    // (v DESC, id % 3 DESC): composite ties — equality must be on the
    // full pair, which the injective embeddings preserve
    // % is nullable in Spark (div-by-zero) — coalesce proves the tie
    // key non-null, the standard idiom the eligibility check demands
    val d2 = data.withColumn("id3",
      coalesce((col("id") % 3).cast("int"), lit(0)))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id3").desc)
    val df = d2.withColumn("rn", rank().over(w)).filter(col("rn") <= 5)
    assert(planOf(df).contains("rank_top_k"))
    val truth = windowTruth(d2.withColumn("rn", rank().over(w)), 5)
    assert(df.collect().toSeq.map(_.toSeq).sortBy(_.toString) == truth)
  }

  test("rank: ASC integral primary (first-k-ranks idiom) and long primary") {
    // ASC first-k with ties
    val d3 = data.withColumn("idm", (col("id") % 40).cast("long"))
      .withColumn("idm", coalesce(col("idm"), lit(0L)))
    val wAscI = Window.partitionBy("g").orderBy(col("idm").asc)
    val dfA = d3.withColumn("rn", rank().over(wAscI)).filter(col("rn") <= 3)
    assert(planOf(dfA).contains("rank_top_k"))
    assert(dfA.collect().toSeq.map(_.toSeq).sortBy(_.toString) ==
      windowTruth(d3.withColumn("rn", rank().over(wAscI)), 3))
    // non-nullable LONG DESC primary, exact above 2^53
    val big = 1L << 53
    val rows = Seq((big + 1, 1), (big, 2), (big, 3), (big - 1, 4))
      .toDF("score", "id").withColumn("g", lit("x"))
      .withColumn("score", coalesce(col("score"), lit(0L))).repartition(2)
    val wL = Window.partitionBy("g").orderBy(col("score").desc)
    val dfL = rows.withColumn("rn", rank().over(wL)).filter(col("rn") <= 2)
    assert(planOf(dfL).contains("rank_top_k"))
    val got = dfL.orderBy("rn", "id").select("id", "rn")
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 1), (2, 2), (3, 2)))
  }

  test("rank: a full tie plateau (every row rank 1) emits the whole group") {
    // the degenerate boundary case: the retained set IS the group — the
    // buffer must grow past its compaction threshold without dropping
    // anything (compaction keeps key >= T and every key == T)
    val rows = spark.range(0, 500).selectExpr(
      "CAST(7.0 AS DOUBLE) AS v", "id", "'x' AS g").repartition(5)
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = rows.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(planOf(df).contains("rank_top_k"))
    val got = df.select("id", "rn").as[(Long, Int)].collect()
    assert(got.length == 500 && got.forall(_._2 == 1))
  }

  // ──────────────── conjunctive filters around the bound ────────────────

  test("rewrites when the bound sits in a conjunction; residual re-applies on top") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val df = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4 && col("v") > 500.0)
    val plan = planOf(df)
    assert(plan.contains("top_k") && !plan.contains("Window"),
      s"conjunction defeated the rewrite:\n$plan")
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val truth = windowTruth(data.withColumn("rn", row_number().over(w)), 4)
      .filter(_(2).asInstanceOf[Double] > 500.0) // (id, g, v, nv, rn)
    assert(got == truth)
  }

  test("conjunction: residual may reference the rank attribute itself") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val df = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4 && col("rn") =!= 2)
    assert(planOf(df).contains("top_k"))
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val truth = windowTruth(data.withColumn("rn", row_number().over(w)), 4)
      .filter(_.last.asInstanceOf[Int] != 2)
    assert(got == truth)
  }

  test("conjunction: several bounds take the smallest k, rest stay as residual") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val df = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("rn") <= 3)
    assert(planOf(df).contains("top_k"))
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == windowTruth(data.withColumn("rn", row_number().over(w)), 3))
  }

  test("conjunction works for rank() too, ties intact") {
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val df = data.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 4 && col("id") % 2 === 0)
    assert(planOf(df).contains("rank_top_k"))
    val got = df.collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val truth = windowTruth(data.withColumn("rn", rank().over(w)), 4)
      .filter(_(0).asInstanceOf[Long] % 2 == 0)
    assert(got == truth)
  }

  test("extensions inject the rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    assert(org.apache.spark.sql.graftbridge.ColumnBridge
      .optimizerRules(ext, spark).contains(TopKWindowRewrite))
  }
}
