package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale-critical physical-plan
  * properties the 100 TB design depends on, locked in as assertions so a
  * future edit can't silently trade them away. Each test inspects the
  * executed plan of a gated query on the sf0.001 fixtures.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("dimension join broadcasts the small side (no shuffled SMJ)") {
    val p = plan("q_j1_dim_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q_d5_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("filters reach the parquet scan as PushedFilters") {
    val p = plan("q_x_rep_ratio")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)"),
      s"doc_id filter not pushed:\n$p")
  }

  test("scans prune to the referenced columns only") {
    val p = plan("q_p3_project")
    // the projection query touches 3 of part's 9 columns
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_retailprice:double>"),
      s"scan reads more than the projection:\n$p")
  }

  test("aggregations are partial+final (map-side combine present)") {
    val p = plan("q_a1_group_mean")
    assert(p.contains("partial_"), s"no partial aggregation stage:\n$p")
  }

  test("global max is a scalar broadcast, not a single-partition window") {
    val p = plan("q_w2_global_max_share")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected 1-row broadcast:\n$p")
    assert(!p.contains("Window"), s"W2 regressed to a window:\n$p")
  }

  test("near-dup candidate generation joins on bucket keys, never cross-joins") {
    val p = plan("q_x_minhash_bands")
    assert(!p.contains("CartesianProduct"), s"cross join in LSH banding:\n$p")
    val pm = plan("q_x_minhash_md5")
    assert(!pm.contains("CartesianProduct"), s"cross join in md5 minhash:\n$pm")
    val pe = plan("q_x_emb_neardups")
    assert(!pe.contains("CartesianProduct"), s"cross join in embedding near-dup:\n$pe")
  }

  test("partition-column filter prunes at planning time (PartitionFilters)") {
    val p = plan("q_s_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not reach the partition pruner:\n$p")
    assert(p.contains("= en)"), s"literal missing from partition filter:\n$p")
  }

  test("bin packing windows are shard-partitioned, never a single partition") {
    // the capstone's pack stage must hash-partition on the shard key; a
    // constant partition key would plan Exchange SinglePartition and
    // serialize the whole corpus through one task at scale
    val p2 = plan("q_x_pipeline2")
    assert(!p2.contains("Exchange SinglePartition"),
      s"single-partition exchange in the capstone pipeline:\n$p2")
    assert(p2.contains("hashpartitioning(__g"),
      s"pack window not hash-partitioned on the shard key:\n$p2")
    val pk = plan("q_x_packed")
    assert(!pk.contains("Exchange SinglePartition"),
      s"single-partition exchange in q_x_packed:\n$pk")
    assert(pk.contains("hashpartitioning(shard"),
      s"pack window not hash-partitioned on shard:\n$pk")
  }

  test("anti-join stays a join, not a collect-then-isin") {
    val p = plan("q_j2_anti")
    assert(p.contains("LeftAnti") || p.contains("BroadcastHashJoin"),
      s"expected anti join operator:\n$p")
  }

  test("tf-idf pair generation joins term-partitioned, never cross-joins") {
    // the only nested-loop allowed is the 1-row corpus-count scalar attach
    // (the W2 pattern); the pair join itself must stay an equi-join
    val p = plan("q_x_tfidf_pairs")
    assert(!p.contains("CartesianProduct"),
      s"cross join in tf-idf pair generation:\n$p")
  }

  test("range join is an equi join on buckets, not a nested loop") {
    // a raw BETWEEN join has no equi-key and plans BNLJ — quadratic; the
    // band rewrite must keep the pair generation hash/merge-joinable
    val p = plan("q_j_range")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cross join in range join:\n$p")
  }

  test("spatial radius join is an equi join on grid cells, not a nested loop") {
    // a raw dist(l,r) <= radius join has no equi-key and plans BNLJ —
    // the grid rewrite must keep the candidate join equi-keyed
    val p = plan("q_j_spatial")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"spatial join fell back to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cross join in spatial join:\n$p")
  }

  test("deterministic samples and BM25 top-k avoid global sorts") {
    // bottom-k / weighted sampling and the BM25 final ranking must plan
    // as TakeOrderedAndProject (bounded per-partition heap + k-row
    // merge); a Sort + GlobalLimit would shuffle-sort the corpus
    Seq("q_d_bottomk", "q_d_weighted", "q_x_bm25").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost its top-k operator:\n$p")
    }
  }

  test("BM25 filters query terms map-side and never cross-joins the corpus") {
    // the IN-list over the query terms must survive into the physical
    // plan (it drops non-query tokens BEFORE the (doc, term) exchange —
    // at 100 TB the difference between shuffling 3 terms' postings and
    // shuffling the tokenized corpus); the only nested-loop allowed is
    // the 1-row stats broadcast
    val p = plan("q_x_bm25")
    assert(p.contains("IN (query,merge,stream)"),
      s"query-term IN filter missing from the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cross join in BM25:\n$p")
  }

  test("dim filter dynamically prunes the partitioned fact scan (DPP)") {
    // a selective dim-side filter must reach the hive-partitioned fact as
    // a runtime partition filter — at 100 TB this is the difference
    // between scanning one partition and scanning the fleet. Both sides
    // are parquet-backed: a LocalRelation dim would be constant-folded
    // before the pruning rule looks for a selective predicate.
    import org.apache.spark.sql.functions._
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_dpp").getAbsolutePath
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"))
    graft.sources.IO.writePartitioned(docs, s"$tmp/fact", Seq("lang"))
    // the dim predicate must be one the planner's isLikelySelective
    // heuristic recognizes (attribute-vs-literal comparison) — a bare
    // boolean attribute does not qualify for pruning insertion
    spark.createDataFrame(Seq(("en", "gold"), ("de", "bronze"), ("fr", "bronze")))
      .toDF("lang", "tier")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim").filter(col("tier") === "gold")
    val q = fact.join(dim, Seq("lang")).groupBy(col("lang")).count()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$p")
  }

  test("AQE splits a planted-skew shuffle join (skew=true in the final plan)") {
    // the skew posture, regression-guarded: joins too big to broadcast
    // rely on AQE's skew-join rule to split a hot key's partition across
    // tasks (explicit salting — SkewJoin.saltedInnerJoin — remains the
    // tool when AQE is off or both sides shuffle-heavy). This plants a
    // 75%-hot key, forbids broadcast, lowers the detection thresholds to
    // fixture scale, and asserts the FINAL adaptive plan carries the
    // skew-handled join marker — so a conf or plan change that silently
    // drops skew handling fails here, not on a 1000-executor stage.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      // incompressible payload — a constant pad would compress below the
      // detection threshold in the shuffle files
      val payload = concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")))
      // 60k rows, 45k on key 0 — one shuffle partition dwarfs the median
      val left = spark.range(0, 60000)
        .select(when(col("id") < 45000, 0L).otherwise(col("id")).as("k"),
          payload.as("pad"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      // global aggregate only: a downstream keyed aggregate would REQUIRE
      // the join's hash partitioning and legally veto the skew split
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"planted skew not split by AQE (no skew=true in the final plan):\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
