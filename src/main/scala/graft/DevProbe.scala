package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SkewJoin}

/** Dev-only scratch main: reference-scale (500k-row) training lifecycle —
  * the reference trains on 500k+ DOT flights (README.md:2,15); this runs
  * the same protocol on the seeded synthetic generator and reports
  * MAE/RMSE + wall time. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      // partition-sizing is the first 100 TB design rule — let big probes
      // raise this so per-task sort buffers stay inside executor memory
      // (the 50M-row lifecycle needs ~256; 32 puts 1.5M wide rows per task)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // activate the graft extensions (SQL function registration + the
      // TopKWindowRewrite optimizer rule): grouped top-k windows over
      // (score DESC [, tie]) become bounded-heap aggregates — k rows per
      // group per partition reach the exchange instead of every row
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // ObjectHashAggregate falls back to SORT-based aggregation past 128
      // in-memory keys per task — that re-sorts the full input and costs
      // 2.4x at the 10M recall-panel rung. The typed aggregates this
      // engine leans on (TopKAgg k-heaps, KMV k-sets) have BOUNDED
      // buffers, so thousands of keys per task are a few MB; raise the
      // threshold so the heap path stays hash-based
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // stages whose generated method exceeds the JVM's 8 KB JIT
      // bytecode cap must FALL BACK (non-WSCG) instead of running
      // interpreted forever; Spark's default guard (65536) sits far
      // above the real HotSpot limit (DontCompileHugeMethods)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.headOption.contains("corpus")) {
      corpusProbe(spark, args.lift(1).map(_.toLong).getOrElse(1000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("skew")) {
      skewProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(16))
      spark.stop()
      return
    }

    if (args.headOption.contains("freq")) {
      freqProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("spans")) {
      spansProbe(spark, args.lift(1).map(_.toLong).getOrElse(1000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("tfidf")) {
      tfidfProbe(spark, args.lift(1).map(_.toLong).getOrElse(100000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("cdc")) {
      cdcProbe(spark, args.lift(1).map(_.toLong).getOrElse(50000L),
        args.lift(2).map(_.toInt).getOrElse(4000))
      spark.stop()
      return
    }

    if (args.headOption.contains("vocab")) {
      vocabProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("streamtopk")) {
      streamTopkProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("pagerank")) {
      pagerankProbe(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(5))
      spark.stop()
      return
    }

    if (args.headOption.contains("spatial")) {
      spatialProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("windowfam")) {
      windowFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("graphfam")) {
      graphFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(1000000L),
        args.lift(2).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("rankfam")) {
      rankFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("embfam")) {
      embFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L),
        skipPairs = args.contains("nopairs"),
        quantized = args.contains("sq"))
      spark.stop()
      return
    }

    if (args.headOption.contains("dbscanfam")) {
      dbscanFamilyProbe(spark,
        args.lift(1).map(_.toLong).getOrElse(1000000L),
        durable = args.contains("durable"))
      spark.stop()
      return
    }

    if (args.headOption.contains("procrustes")) {
      procrustesProbe(spark,
        args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("opq")) {
      opqProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("opqserve")) {
      opqServeProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("opqsample")) {
      opqSampleProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L),
        args.lift(2).map(_.split(",").toSeq.map(_.toDouble))
          .getOrElse(Seq(0.02)))
      spark.stop()
      return
    }

    if (args.headOption.contains("prbisect")) {
      prBisect(spark, args.lift(1).getOrElse("/root/repo/tmp/sf1"))
      spark.stop()
      return
    }

    if (args.headOption.contains("hitsbisect")) {
      hitsBisect(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
      spark.stop()
      return
    }

    if (args.headOption.contains("mnnab")) {
      mnnAb(spark, args.lift(1).map(_.toInt).getOrElse(22000),
        args.lift(2).map(_.toInt).getOrElse(8),
        args.lift(3).map(_.toInt).getOrElse(16))
      spark.stop()
      return
    }

    if (args.headOption.contains("lshbisect")) {
      lshBisect(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
      spark.stop()
      return
    }

    if (args.headOption.contains("bpe")) {
      bpeProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(24))
      spark.stop()
      return
    }

    if (args.headOption.contains("p4bisect")) {
      p4Bisect(spark, args.lift(1).getOrElse("/root/repo/tmp/sf1"))
      spark.stop()
      return
    }

    if (args.headOption.contains("kmeansbisect")) {
      kmeansBisect(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(3))
      spark.stop()
      return
    }

    if (args.headOption.contains("mnnstage")) {
      mnnStageProbe(spark, args.lift(1).getOrElse("/root/repo/tmp/sf1"),
        args.lift(2).map(_.toInt).getOrElse(4096))
      spark.stop()
      return
    }

    if (args.headOption.contains("bpegate")) {
      bpeGateProbe(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(8))
      spark.stop()
      return
    }

    if (args.headOption.contains("graphskew")) {
      graphSkewProbe(spark, args.lift(1).map(_.toLong).getOrElse(5000000L),
        args.lift(2).map(_.toDouble).getOrElse(0.1))
      spark.stop()
      return
    }

    if (args.headOption.contains("opqpolicy")) {
      opqPolicyProbe(spark, args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toDouble).getOrElse(0.05))
      spark.stop()
      return
    }

    if (args.headOption.contains("gramfam")) {
      gramFamProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("embstage")) {
      embStageBisect(spark, args.lift(1).map(_.toLong).getOrElse(30000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("calibrate")) {
      calibrateProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("kmvfam")) {
      kmvFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("jl")) {
      jlProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("recallfam")) {
      recallFamilyProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    if (args.headOption.contains("selfam")) {
      selectionProbe(spark, args.lift(1).map(_.toLong).getOrElse(10000000L))
      spark.stop()
      return
    }

    val rows = args.headOption.map(_.toLong).getOrElse(500000L)
    val t0 = System.nanoTime()
    val flights = graft.sources.FlightsGenerator.flights(spark, rows, seed = 42L,
      tailPool = 4000)
    val plane = graft.sources.FlightsGenerator.planeData(spark, tailPool = 4000)
    val prepared = graft.operators.Prepare.prepareData(
      graft.operators.Cleaning.dropForbidden(flights), plane).cache()
    val nPrepared = prepared.count()
    val t1 = System.nanoTime()

    val pm = graft.ml.FlightPipeline().fit(prepared)
    val t2 = System.nanoTime()
    val result = graft.ml.FlightModel.trainModel(prepared, pm)
    val t3 = System.nanoTime()

    val preds = result.predictions.get
    val Some((mae, rmse)) = graft.ml.FlightModel.evaluate(preds)
    val labeled = graft.ml.FlightModel.addLabels(preds)
    val acc = labeled.filter(col("predicted_label") === col("actual_label")).count().toDouble /
      labeled.count()
    result.release()
    val t4 = System.nanoTime()

    println(f"[$rows] prepared_rows=$nPrepared prep=${(t1 - t0) / 1e9}%.1fs " +
      f"pipeline_fit=${(t2 - t1) / 1e9}%.1fs dt_train=${(t3 - t2) / 1e9}%.1fs " +
      f"eval=${(t4 - t3) / 1e9}%.1fs")
    println(f"[$rows] MAE=$mae%.3f RMSE=$rmse%.3f label_accuracy=$acc%.3f")
    result.model.foreach { m =>
      val imps = graft.ml.FlightModel.featureImportances(m, pm.transform(prepared.limit(1)))
      println(s"[$rows] top importances: " + imps.take(5).map {
        case (n, s) => f"$n=$s%.3f" }.mkString(", "))
    }
    spark.stop()
  }

  /** Skew stress probe (`runMain graft.DevProbe skew [n] [salts]`):
    * zipfian fact keys (top key holds ~1/ln(K) ≈ 14% of all rows) joined
    * to a mid-size dim through a plain shuffle join vs [[SkewJoin
    * .saltedInnerJoin]] — AQE and auto-broadcast are disabled for the
    * comparison so the hot key genuinely lands on one reducer, which is
    * the 100 TB failure mode the salt exists for. Then the same zipfian
    * corpus runs the exact-dedup census, whose hash-grouped min(id) must
    * stay fast under duplicate skew because partial aggregation collapses
    * hot groups map-side before the exchange. */
  private def skewProbe(spark: SparkSession, n: Long, salts: Int): Unit = {
    import spark.implicits._
    val K = 1000
    val lnK = math.log(K.toDouble)
    // zipf-with-a-spike, deterministic per row id: 60% of all rows hit
    // key 0 (the "viral entity" shape), the rest follow an inverse-CDF
    // zipf tail — the distribution where one reducer stalls the stage
    val facts = spark.range(n).map { i =>
      val u = new scala.util.Random(i).nextDouble()
      val key =
        if (u < 0.6) 0L
        else math.min(K - 1L, math.exp((u - 0.6) / 0.4 * lnK).toLong - 1L)
      (i, key, i % 97)
    }.toDF("id", "key", "v").cache()
    facts.count() // materialize before the clock starts
    val dim = spark.range(K.toLong)
      .map(k => (k, s"payload_$k " * 40)).toDF("key", "payload").cache()
    dim.count()
    val hot = facts.groupBy("key").count()
      .orderBy(col("count").desc).limit(3).collect()
    println(s"[skew $n] hottest keys: " +
      hot.map(r => s"${r.get(0)}=${r.get(1)}").mkString(", "))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[skew $n] $label rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // aggregate over the payload so the joined bytes actually flow (a bare
    // count() lets Catalyst prune the payload and join key-only rows)
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("payload")))).head().getLong(0)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      time("plain shuffle join")(drain(facts.join(dim, "key")))
      time(s"salted join (salts=$salts)")(
        drain(SkewJoin.saltedInnerJoin(facts, dim, "key", salts)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    // dedup under duplicate skew: the hot text covers ~14% of the corpus
    val docs = facts.select(col("id").as("doc_id"),
      concat(lit("document body number "), col("key")).as("text"))
    time("exact dedup census")(
      Dedup.distinctMinIds(docs, "doc_id", "text").count())
    facts.unpersist(); dim.unpersist()
  }

  /** Heavy-hitters scale probe (`runMain graft.DevProbe freq [n]`): n rows,
    * 40% on one hot key, the rest spread over ~n/10 distinct tail items —
    * the domain where exact `GROUP BY item` shuffles one row per DISTINCT
    * item while the Misra-Gries aggregate shuffles at most `capacity`
    * counters per partition. Prints both wall times and checks the sketch
    * put the hot item first with an estimate inside the error bound. */
  private def freqProbe(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val tail = math.max(n / 10, 1000L)
    val items = spark.range(n).map { i =>
      if (new scala.util.Random(i).nextDouble() < 0.4) "hot"
      else s"item_${i % tail}"
    }.toDF("item").cache()
    items.count()

    val t0 = System.nanoTime()
    val exact = items.groupBy(col("item")).count()
      .orderBy(col("count").desc, col("item")).limit(5).collect()
    val tExact = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val sketchTop = items
      .agg(graft.functions.FreqItems.freqItems(col("item"), 64, 5).as("top"))
      .select(explode(col("top")).as("h"))
      .select(col("h.item"), col("h.est")).collect()
    val tSketch = (System.nanoTime() - t1) / 1e9

    val trueHot = exact.head.getLong(1)
    val estHot = sketchTop.head.getLong(1)
    println(f"[freq $n] exact=${tExact}%.2fs sketch=${tSketch}%.2fs " +
      f"hot_true=$trueHot hot_est=$estHot " +
      s"rank1=${sketchTop.head.getString(0)} " +
      f"bound_ok=${estHot <= trueHot && estHot >= trueHot - n / 65}")
    items.unpersist()
  }

  /** Sketched-df scale probe (`runMain graft.DevProbe vocab [n]`): n docs
    * of 12 words — 8 drawn from a 64-word hot pool (each hot word's df ≈
    * n) + 4 unique — the vocabulary shape where exact count-distinct df
    * must shuffle one expanded row per distinct (word, doc) pair while
    * the sketched path ships one fixed-size HLL per (word, map
    * partition). Reports wall + total shuffle write bytes for each path:
    * the sketched shuffle must stay FLAT in the hot words' df where the
    * exact one grows linearly with the corpus. */
  private def vocabProbe(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val docs = spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val hot = Seq.fill(8)(s"hot_${rnd.nextInt(64)}").mkString(" ")
      val uniq = (0 until 4).map(j => s"u_${i}_$j").mkString(" ")
      (i, s"$hot $uniq")
    }.toDF("doc_id", "text").cache()
    docs.count()

    def measure(run: => Long): (Double, Long, Long) = {
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          bytes.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val out = run
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the stage events
      spark.sparkContext.removeSparkListener(listener)
      (wall, bytes.get(), out)
    }

    val ta = graft.operators.TextAnalysis
    val (tEx, bEx, rEx) = measure(
      ta.vocabulary(docs, "doc_id", "text").filter(col("df") > 1).count())
    val (tSk, bSk, rSk) = measure(
      ta.vocabularySketched(docs, "doc_id", "text").filter(col("df") > 1).count())
    println(f"[vocab $n mixed] exact=${tEx}%.1fs shuffle=${bEx / 1e6}%.1fMB hot_words=$rEx | " +
      f"sketched=${tSk}%.1fs shuffle=${bSk / 1e6}%.1fMB hot_words=$rSk")
    docs.unpersist()

    // fixed-vocabulary corpus (no unique tail): the regime the sketch is
    // FOR — exact df shuffles one row per (word, doc) pair, linear in n;
    // the sketched shuffle must stay flat as the corpus doubles
    for (m <- Seq(n / 2, n)) {
      val fixed = spark.range(m).map { i =>
        val rnd = new scala.util.Random(i)
        (i, Seq.fill(12)(s"hot_${rnd.nextInt(64)}").mkString(" "))
      }.toDF("doc_id", "text").cache()
      fixed.count()
      // consume df in the action — a bare count() lets Catalyst prune the
      // distinct aggregate away and measures an empty plan
      val (fEx, fbEx, _) = measure(
        ta.vocabulary(fixed, "doc_id", "text").filter(col("df") > 0).count())
      val (fSk, fbSk, _) = measure(
        ta.vocabularySketched(fixed, "doc_id", "text").filter(col("df") > 0).count())
      println(f"[vocab $m fixed-vocab] exact=${fEx}%.1fs shuffle=${fbEx / 1e6}%.1fMB | " +
        f"sketched=${fSk}%.1fs shuffle=${fbSk / 1e6}%.1fMB")
      fixed.unpersist()
    }
  }

  /** Duplicated-passage scale probe (`runMain graft.DevProbe spans [n]`):
    * n docs of ~60-180 tokens, 10% exact dups + a boilerplate footer on
    * every 7th doc — the shape where span detection has real work. At 1M
    * docs this emits tens of millions of (md5, id) rows; the probe proves
    * the hash-keyed reduce holds (no text in the shuffle, partial
    * aggregation collapses repeated spans map-side). */
  private def spansProbe(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val footer = " CONFIDENTIAL DO NOT DISTRIBUTE COPYRIGHT TWENTY TWENTY SIX ALL RIGHTS RESERVED"
    val docs = spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val base = Array.fill(60 + rnd.nextInt(120))(s"w${rnd.nextInt(4000)}")
        .mkString(" ")
      val t =
        if (i % 10 == 0 && i > 0) {
          val prev = new scala.util.Random(i - 1)
          Array.fill(60 + prev.nextInt(120))(s"w${prev.nextInt(4000)}")
            .mkString(" ")                              // exact dup of i-1
        } else if (i % 7 == 0) base + footer            // shared boilerplate
        else base
      (i, t)
    }.toDF("doc_id", "text").cache()
    docs.count()
    val t0 = System.nanoTime()
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 40, stride = 10, minDocs = 2).cache()
    val nSpans = spans.count()
    val maxDocs = spans.agg(max(col("n_docs"))).head().getLong(0)
    println(f"[spans $n] dup_span_hashes=$nSpans max_docs_per_span=$maxDocs " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spans.unpersist(); docs.unpersist()
  }

  /** Sharded-vs-unsharded streaming top-k (`runMain graft.DevProbe
    * streamtopk [n]`): feeds `n` high-cardinality events through
    * [[graft.streaming.EventStreams.windowedShardTops]] with shards=1
    * (the round-3 shape: every event of a window through ONE state
    * group / one task) and shards=32, and reports wall time plus the
    * merged top-5 of the heaviest window. The items follow a
    * zipf-with-a-spike mix over ~100k distinct types, so the Misra-Gries
    * summaries run under genuine eviction pressure; correctness of the
    * merge is asserted (same top item both ways). */
  private def streamTopkProbe(spark: SparkSession, n: Long): Unit = {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Event
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val windowMs = 3600 * 1000L
    val base = 1700000000000L - (1700000000000L % windowMs)
    val perWindow = n / 4
    def mkEvent(i: Long): Event = {
      val u = new scala.util.Random(i).nextDouble()
      val item =
        if (u < 0.3) s"hot${i % 3}"
        else s"t${(u * 100000).toInt}"
      // 4 consecutive hour windows, fed in EVENT-TIME ORDER with a
      // MONOTONE timestamp (a cycling within-window offset puts every
      // batch after the first behind the watermark — silently dropped
      // as late, which is exactly the mistake this probe first made):
      // the discipline a real ingest has
      val window = i / perWindow
      val ts = base + window * windowMs + ((i % perWindow) * windowMs) / perWindow
      Event(i, new Timestamp(ts), i % 1000, item, 1.0)
    }

    def run(shards: Int): (Double, Seq[(String, Long)]) = {
      val in = MemoryStream[Event]
      val sink = s"probe_topk_$shards"
      val q = EventStreams.windowedShardTops(in.toDS(), windowMs,
          capacity = 64, k = 5, shards = shards, watermark = "10 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      try {
        val batch = 250000L
        var fed = 0L
        while (fed < n) {
          val hi = math.min(n, fed + batch)
          in.addData((fed until hi).map(mkEvent))
          q.processAllAvailable()
          fed = hi
        }
        // far-future event advances the watermark past every window end:
        // all (window, shard) groups time out and emit
        in.addData(Event(n + 1, new Timestamp(base + 100 * windowMs), 1, "flush", 1.0))
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        val top = EventStreams.topKWithinWindows(
            spark.table(sink).as[EventStreams.ShardTop], 5)
          .filter(col("bucket_start") === new Timestamp(base))
          .orderBy(col("rank")).collect()
          .map(t => (t.item, t.est)).toSeq
        (secs, top)
      } finally q.stop()
    }

    // the transformWithState + RocksDB single-query formulation, same feed
    def runChained(): (Double, Seq[(String, Long)]) = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val in = MemoryStream[Event]
      val q = EventStreams.windowedTopTypesChained(in.toDS(), windowMs,
          capacity = 64, k = 5, shards = 32, watermark = "10 minutes")
        .writeStream.format("memory").queryName("probe_topk_chained")
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      try {
        val batch = 250000L
        var fed = 0L
        while (fed < n) {
          val hi = math.min(n, fed + batch)
          in.addData((fed until hi).map(mkEvent))
          q.processAllAvailable()
          fed = hi
        }
        // the downstream aggregate needs watermark advances past each
        // emit timestamp — successive far-future flushes provide them
        Seq(100L, 200L, 300L).foreach { m =>
          in.addData(Event(n + m, new Timestamp(base + m * windowMs), 1, "flush", 1.0))
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val top = spark.table("probe_topk_chained")
          .filter(col("bucket_start") === new Timestamp(base))
          .select(explode(col("tops")).as("t"))
          .select(col("t.item"), col("t.est"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        (secs, top)
      } finally {
        q.stop()
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }

    val (t1, top1) = run(1)
    val (t32, top32) = run(32)
    val (tc, topc) = runChained()
    // exact count of the window-0 top item, replayed from the generator
    // (seeded first-draws are not uniform enough to assume 30%)
    val topItem = top32.head._1
    var trueTop = 0L
    var i = 0L
    while (i < perWindow) {
      if (mkEvent(i).event_type == topItem) trueTop += 1
      i += 1
    }
    println(f"[streamtopk $n] shards=1  time=$t1%.1fs top=${top1.take(3)}")
    println(f"[streamtopk $n] shards=32 time=$t32%.1fs top=${top32.take(3)}")
    println(f"[streamtopk $n] chained/rocksdb (shards=32) time=$tc%.1fs top=${topc.take(3)}")
    require(top1.headOption.map(_._1) == top32.headOption.map(_._1),
      s"sharded and unsharded disagree on the top item: $top1 vs $top32")
    require(topc.headOption.map(_._1) == top32.headOption.map(_._1),
      s"chained disagrees on the top item: $topc vs $top32")
    // sharding tightens the Misra-Gries undercount bound by the shard
    // count: each shard holds ~1/32 of the distinct items, so its
    // 64-counter summary evicts far less
    val err1 = trueTop - top1.head._2
    val err32 = trueTop - top32.head._2
    println(f"[streamtopk $n] true($topItem)=$trueTop undercount: " +
      f"shards=1 → $err1, shards=32 → $err32")
    require(err32 >= 0 && err1 >= 0, "Misra-Gries estimate exceeded the true count")
    require(err32 <= err1, "sharding did not tighten the estimate")
  }

  /** CDC-span formulation shoot-out (`runMain graft.DevProbe cdc [n] [len]`):
    * md5-anchored (the DuckDB-oracled path — one Generate row + one md5
    * digest PER CHARACTER POSITION) vs the fused native expression (one
    * xxhash64 per scanned byte inside a single codegen'd pass, explode of
    * anchors only — 1/16 of positions). The gap is invisible on the
    * short-doc gate fixture and decisive on long documents, where the
    * per-position row machinery dominates. Docs: seeded text of ~`len`
    * chars; every 10th doc duplicates its predecessor shifted by 1-9
    * chars, so both paths must find the shifted copies (stride sampling
    * would not). */
  private def cdcProbe(spark: SparkSession, n: Long, len: Int): Unit = {
    import spark.implicits._
    val docs = spark.range(n).map { i =>
      def body(seed: Long): String = {
        val rnd = new scala.util.Random(seed)
        val sb = new StringBuilder(len + 16)
        while (sb.length < len) sb.append(s"w${rnd.nextInt(100000)} ")
        sb.toString
      }
      val t =
        if (i % 10 == 0 && i > 0)
          ("x" * (1 + (i % 9)).toInt) + body(i - 1) // shifted copy of i-1
        else body(i)
      (i, t)
    }.toDF("doc_id", "text").cache()
    docs.count()
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = df.cache()
      val nSpans = out.count()
      val maxDocs = out.agg(max(col("n_docs"))).head().getLong(0)
      println(f"[cdc $n×$len] $label dup_span_hashes=$nSpans " +
        f"max_docs_per_span=$maxDocs time=${(System.nanoTime() - t0) / 1e9}%.1fs")
      out.unpersist()
    }
    time("md5-anchored ")(Dedup.anchoredSpans(docs, "doc_id", "text",
      window = 40, gram = 8, sel = "0", minDocs = 2))
    time("fused-xxhash ")(Dedup.anchoredSpansFast(docs, "doc_id", "text",
      window = 40, gram = 8, maskBits = 4, minDocs = 2))
    docs.unpersist()
  }

  /** Inverted-index TF-IDF scale probe (`runMain graft.DevProbe tfidf [n]`):
    * measures the term-partitioned pair join at corpus scale with the df
    * cap doing its job — the probe prints the candidate-pair count so the
    * fan-out bound is visible, not assumed. The vocabulary must out-scale
    * the corpus (a rare tail, like real text): with a small vocab every
    * term's df exceeds the cap and ALL pairs vanish — the cap working as
    * designed, but measuring nothing. */
  private def tfidfProbe(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val vocab = math.max(1000000L, n * 10)
    val docs = spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val t =
        if (i % 10 == 0 && i > 0) {
          val prev = new scala.util.Random(i - 1)
          Array.fill(40 + prev.nextInt(40))(s"w${prev.nextInt(vocab.toInt)}")
            .mkString(" ")                              // exact dup of i-1
        } else Array.fill(40 + rnd.nextInt(40))(s"w${rnd.nextInt(vocab.toInt)}")
          .mkString(" ")
      (i, t)
    }.toDF("doc_id", "text").cache()
    docs.count()
    val t0 = System.nanoTime()
    val pairs = graft.operators.SparseSimilarity.tfidfPairs(
      docs, "doc_id", "text", maxDf = 50L, minCos = 0.8,
      materialize = _.localCheckpoint()).cache()
    val nPairs = pairs.count()
    println(f"[tfidf $n] pairs_cos_ge_0.8=$nPairs " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    pairs.unpersist(); docs.unpersist()
  }

  /** Text-surface scale probe: a seeded n-doc synthetic corpus (10% exact
    * duplicates, 2% junk, a benchmark slice overlapping real docs) pushed
    * through the full CorpusPipeline with shard-grained packing. */
  /** Per-iteration wall time of the PageRank loop on the sfDir lineitem
    * bipartite graph — the checkpoint callback is the iteration boundary. */
  private def pagerankProbe(spark: SparkSession, sfDir: String, iters: Int): Unit = {
    val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((-col("l_suppkey")).as("src"), col("l_partkey").as("dst"))
    // cold-path breakdown: how much of iteration 1 is cache warm-up?
    val w0 = System.nanoTime()
    val ec = e.distinct().count()
    val warmSec = (System.nanoTime() - w0) / 1e9
    println(f"[pagerank] warm e.distinct=$ec in $warmSec%.2fs")
    val t0 = System.nanoTime()
    var last = t0
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val r = graft.operators.Graph.pageRank(spark, e, iters,
      checkpoint = { df =>
        if (times.length == 2) // iteration 3: caches warm, steady state
          println(df.queryExecution.executedPlan.toString.take(6000))
        val out = df.localCheckpoint()
        val now = System.nanoTime()
        times += (now - last) / 1e9
        last = now
        out
      })
    val n = r.count()
    println(f"[pagerank] nodes=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs " +
      s"per-iter=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  private def corpusProbe(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    // vocab shape matters: stopwords at ~20% token frequency (so the
    // language gate sees hits) over a 4000-word rare tail (so trigram
    // shingles only collide between true copies — a tiny vocab makes
    // every doc "contaminated" and the decontam probe degenerate)
    val stop = graft.operators.TextAnalysis.LangMarkers("en").toArray
    val vocab: Array[String] =
      Array.tabulate(1000)(i => stop(i % stop.length)) ++
        Array.tabulate(4000)(i => s"w$i")
    def text(seed: Long): String = {
      val rnd = new scala.util.Random(seed)
      val len = 60 + rnd.nextInt(120)
      Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // cache the generated corpus: the pipeline lineage scans it several
    // times (gate, dedup window, decontam probe, chunk) and regenerating
    // 1M seeded docs per scan would time the generator, not the pipeline
    val docs = spark.range(n).map { i =>
      val t =
        if (i % 50 == 3) "zzz qqq xxx"                   // junk → gated out
        else if (i % 10 == 0 && i > 0) text(i - 1)       // exact dup of i-1
        else text(i)
      (i, t)
    }.toDF("doc_id", "text").cache()
    // benchmark: 1000 docs, half sharing text with corpus ids (leakage)
    val bench = spark.range(n, n + 1000)
      .map(i => text(if (i % 2 == 0) i - n + 1 else i)).toDF("text")

    docs.count() // materialize the corpus before the clock starts
    val t0 = System.nanoTime()
    val chunks = graft.operators.CorpusPipeline.trainingChunks(
      docs, bench, packShards = 128,
      materializeDedup = _.localCheckpoint()).cache()
    val nChunks = chunks.count()
    val t1 = System.nanoTime()
    val nBins = chunks.select("shard", "bin").distinct().count()
    val nDocs = chunks.select("doc_id").distinct().count()
    val t2 = System.nanoTime()
    println(f"[corpus $n] chunks=$nChunks docs_kept=$nDocs bins=$nBins " +
      f"pipeline=${(t1 - t0) / 1e9}%.1fs stats=${(t2 - t1) / 1e9}%.1fs")
    chunks.unpersist(); docs.unpersist()
  }

  /** Spatial radius join at scale: n points per side scattered uniformly
    * (hash-derived, deterministic) over a plane sized for CONSTANT
    * density (side length grows with sqrt(n)), radius fixed — so the
    * true pair count grows linearly with n while the naive cross-join
    * candidate space grows with n². Reports wall time, pairs found, and
    * the candidate fan-in the grid avoided. */
  private def spatialProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    val side = math.sqrt(n.toDouble) * 10.0 // ~100 units² per point/side
    val radius = 5.0
    def pts(salt: Int, id: String) = spark.range(n).select(
      col("id").as(id),
      (abs(xxhash64(col("id"), lit(salt))) % 1000000).cast("double")
        / 1000000.0 * side).toDF(id, "x")
      .withColumn("y",
        (abs(xxhash64(col(id), lit(salt + 7))) % 1000000).cast("double")
          / 1000000.0 * side)
    val l = pts(1, "lid").cache(); val r = pts(2, "rid").cache()
    l.count(); r.count()
    val t0 = System.nanoTime()
    val pairs = graft.operators.Spatial.radiusJoin(
      l, r, "lid", "rid", "x", "y", radius).count()
    val t1 = System.nanoTime()
    println(f"[spatial $n/side] side=$side%.0f radius=$radius pairs=$pairs " +
      f"join=${(t1 - t0) / 1e9}%.1fs naive_candidates=${n * n}%d")
    l.unpersist(); r.unpersist()
  }

  /** Windowed-analytics family at event scale: n synthetic events over
    * n/1000 users (hash-derived types/values/timestamps, deterministic),
    * driven through the four one-user-window operators (rolling
    * anomaly, Markov transitions, touch attribution, TWAP) plus the
    * two-scan PSI — each shares the SAME user-keyed shuffle shape, so
    * this measures that family's scaling directly. Narrow rows
    * (4 columns) keep the shuffle working set ~tens of bytes/row:
    * disk-safe at 100M+. */
  private def windowFamilyProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    val users = math.max(1000L, n / 1000L)
    val types = Array("view", "click", "search", "email", "purchase")
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(users)).as("user_id"),
      (col("id") * 37L + pmod(xxhash64(col("id"), lit(2)), lit(1000L)))
        .as("ts"),
      element_at(typedLit(types),
        (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      (pmod(xxhash64(col("id"), lit(4)), lit(30000L)).cast("double") / 100.0)
        .as("value")).cache()
    ev.count()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[windowfam $n] $tag rows=$out wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timed("anomaly") {
      graft.operators.TimeSeries.rollingAnomaly(ev, "user_id", "ts",
        "value", tieCol = "event_id", zThresh = 2.5)
        .where(col("is_anomaly")).count()
    }
    timed("transitions") {
      graft.operators.Funnel.transitionMatrix(ev, "user_id", "ts",
        "event_type", "event_id").count()
    }
    timed("attribution") {
      graft.operators.Cohort.touchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "value", convType = "purchase").count()
    }
    timed("twap") {
      graft.operators.TimeSeries.timeWeightedAvg(ev, "user_id", "ts",
        "value", tieCol = "event_id").count()
    }
    timed("psi") {
      graft.operators.Drift.psiBins(
        ev.where(col("event_id") % 2 === 0),
        ev.where(col("event_id") % 2 === 1),
        "value", lo = 0.0, hi = 320.0, bins = 16).count()
    }
    ev.unpersist()
  }

  /** Global-order family at scale: n hash-derived values (1M distinct,
    * so the distinct-value relations stay large but sub-row-count)
    * through the four prefix-sum/range-partition consumers — exact CDF,
    * Spearman (two rank joins), ABC classification (100k keys), and
    * NTILE over the FULL row set (the only one that range-shuffles
    * every row, the family's worst case). Measures the two-pass
    * (count-then-index) RDD machinery's scaling directly. */
  private def rankFamilyProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    val df = spark.range(n).select(
        col("id"),
        (pmod(xxhash64(col("id"), lit(21)), lit(1000000L)).cast("double")
          / 100.0).as("x"))
      .withColumn("y",
        col("x") * 2.0 +
          pmod(xxhash64(col("id"), lit(22)), lit(1000L)).cast("double"))
      .withColumn("k", pmod(xxhash64(col("id"), lit(23)), lit(100000L)))
      .cache()
    df.count()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[rankfam $n] $tag out=$out wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timed("cdf") {
      graft.operators.GlobalOrder.exactCdf(df, "x").count()
    }
    timed("spearman") {
      graft.operators.Profiling.spearman(df, "x", "y").head(); 1L
    }
    timed("abc") {
      graft.operators.GlobalOrder.abcClassification(df, "k", "x").count()
    }
    timed("ntile100") {
      graft.operators.GlobalOrder.ntileAtScale(df, Seq("x", "id"), 100)
        .groupBy(col("ntile")).count().count()
    }
    df.unpersist()
  }

  /** Graph family at scale: a deterministic random digraph (hash-derived
    * endpoints over `nodes` vertices, `edges` edges — expected degree
    * edges/nodes, so wedge volume stays ~deg²·nodes) through triangle
    * counting, 3-round HITS, and 3-round LPA. */
  /** Hot-source-skew rung (`runMain graft.DevProbe graphskew [edges]
    * [hotFrac]`): prices the single-shuffle adjacency build
    * (`repartition(src).distinct()`) against the balanced two-shuffle
    * one (`distinct().repartition(src)`) on a power-law-ish edge set
    * where ONE source holds `hotFrac` of all edges — the skew trade the
    * repartition-first ordering makes: the final dedup aggregate
    * reduces on src-partitioned data, so a hot source's edges land in
    * one task (map-side partial aggregation still dedups within input
    * partitions first). Also drives 3 pageRank iterations on top of
    * each build — the per-iteration merge join needs the src
    * partitioning regardless, so the build choice is the ONLY plan
    * difference. */
  private def graphSkewProbe(spark: SparkSession, edges: Long,
      hotFrac: Double): Unit = {
    import org.apache.spark.sql.functions._
    val nodes = edges / 10
    // hotFrac of edges come out of node 0 (distinct dsts — the worst
    // case for the src-local dedup: nothing collapses map-side), the
    // rest uniform
    val e = spark.range(edges).select(
      when(col("id") < (edges * hotFrac).toLong, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(11)), lit(nodes))).as("src"),
      pmod(xxhash64(col("id"), lit(13)), lit(nodes)).as("dst"))
      .localCheckpoint()
    e.count()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[graphskew $edges/$hotFrac] $tag out=$out " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    def drain(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    timed("build repartition-first (1 shuffle, hot src in one dedup task)") {
      drain(e.select(col("src"), col("dst")).repartition(col("src")).distinct())
    }
    timed("build distinct-first (2 shuffles, balanced dedup)") {
      drain(e.select(col("src"), col("dst")).distinct().repartition(col("src")))
    }
    timed("pagerank3 (repartition-first inside)") {
      graft.operators.Graph.pageRank(spark, e, iters = 3).count()
    }
  }

  private def graphFamilyProbe(spark: SparkSession, nodes: Long,
      edges: Long): Unit = {
    import org.apache.spark.sql.functions._
    val e = spark.range(edges).select(
      pmod(xxhash64(col("id"), lit(11)), lit(nodes)).as("src"),
      pmod(xxhash64(col("id"), lit(13)), lit(nodes)).as("dst")).cache()
    e.count()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[graphfam $nodes/$edges] $tag out=$out wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timed("triangles") {
      graft.operators.Graph.triangleCount(e, "src", "dst")
        .head().getLong(0)
    }
    timed("hits3") {
      graft.operators.Graph.hits(spark, e, iters = 3).count()
    }
    timed("lpa3") {
      graft.operators.Graph.labelPropagation(spark, e, iters = 3).count()
    }
    // expected degree 2·edges/nodes — k at half that peels a real
    // fraction without emptying the core
    timed("kcore") {
      graft.operators.Graph.kCore(spark, e,
        k = math.max(2, (edges / nodes).toInt), rounds = 6).count()
    }
    timed("bfs4") {
      graft.operators.Graph.bfsDistances(spark, e, source = 0L,
        maxDepth = 4).count()
    }
    timed("degdist") {
      graft.operators.Graph.degreeHistogram(e, "src", "dst").count()
    }
    timed("assortativity") {
      graft.operators.Graph.assortativity(e, "src", "dst").head(); 1L
    }
    timed("clustercoef") {
      graft.operators.Graph.clusteringCoefficient(e, "src", "dst").count()
    }
    timed("linkpred") {
      graft.operators.Graph.linkPrediction(e, "src", "dst", minCommon = 2)
        .count()
    }
    e.unpersist()
  }

  /** Selection-operator rung (`runMain graft.DevProbe selfam [n]`):
    * greedy k-center and MMR over n 64-dim vectors with one planted
    * antipode of the seed (must be k-center's round-2 pick at any
    * corpus size — direction, not magnitude, is what cosine sees).
    * Watch: per-round wall (must stay ~flat round-over-round modulo
    * the growing j-term least/greatest chain), total ~linear in n,
    * zero exchanges in the per-round plan (map-side fused cosines +
    * a partial-aggregated 1-row struct-max). */
  private def selectionProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Selection
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[selfam $n] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dim = 64
    val seedVec = {
      val r = new scala.util.Random(0L)
      Seq.fill(dim)(r.nextGaussian().toFloat)
    }
    val corpus = spark.range(n).map { i =>
      if (i == 0L) (i, seedVec)
      else if (i == n - 1) (i, seedVec.map(x => -x)) // the antipode
      else {
        val r = new scala.util.Random(i)
        (i, Seq.fill(dim)(r.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding").localCheckpoint()
    timed("generate+checkpoint")(corpus.count())
    val kc = timed("farthestFirst k=8")(
      Selection.farthestFirst(corpus, "vec_id", "embedding", 8).collect())
    println(s"[selfam $n] k-center picks: ${kc.map(_.getLong(1)).mkString(",")}")
    require(kc(1).getLong(1) == n - 1,
      s"round 2 must pick the planted antipode, got ${kc(1)}")
    val mm = timed("mmr k=8")(
      Selection.mmr(corpus, "vec_id", "embedding", 8).collect())
    println(s"[selfam $n] mmr picks: ${mm.map(_.getLong(1)).mkString(",")}")
  }

  /** Stage-by-stage bisect of the refineOversizedBlocks DAG (dev tool
    * for localizing the 10M→30M census blowup): times each sub-plan
    * with a no-op action, no caching anywhere. */
  private def embStageBisect(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Similarity
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[embstage $n] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dim = 64
    val family = Array.tabulate(dim)(i => (math.sin(i + 1.0) * 2.0).toFloat)
    val corpus = spark.range(n).map { i =>
      if (i % 100 == 0) (i, family.toSeq)
      else {
        val r = new scala.util.Random(i)
        (i, Seq.fill(dim)(r.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding").cache()
    timed("generate+cache")(corpus.count())
    val nPlanes = Similarity.planesFor(n, targetBucketSize = 64)
    val blocked = Similarity.hyperplaneBuckets(corpus, "embedding", nPlanes, 42L, dim)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    timed("a) bucket project (foreach)")(noop(blocked.select(col("bucket"))))
    val rows = blocked.select(col("bucket").as("__g"),
      col("vec_id").as("__id"), col("embedding").as("__v"))
    timed("b) census1 agg")(
      rows.groupBy("__g").agg(count(lit(1))).agg(max(lit(1))).head())
    val planes = Similarity.subBucketPlanes(dim)
    val maxBlock = 256
    val census = rows.groupBy(col("__g").as("__cg")).agg(count(lit(1)).as("__n"))
    val m = expr(s"(__n + ${maxBlock - 1}) div $maxBlock")
    val bits = when(col("__n") <= maxBlock, lit(0))
      .otherwise(least(lit(planes.length - 1), length(bin(m - lit(1))).cast("int")))
    val withBits = rows
      .join(broadcast(census.select(col("__cg"), bits.as("__bits"))),
        col("__g") <=> col("__cg"))
      .drop("__cg")
    timed("c) + census broadcast join")(noop(withBits.select(col("__g"), col("__bits"))))
    val sub = planes.init.zipWithIndex.map { case (p, i) =>
      when(lit(i) < col("__bits") &&
          round(graft.functions.VectorExprs.dot(col("__v"), typedLit(p)), 9) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withSub = withBits.withColumn("__sub", sub).drop("__bits")
    timed("d) + sub-bucket dots")(noop(withSub.select(col("__g"), col("__sub"))))
    val refined = Similarity.refineOversizedBlocks(blocked, "bucket",
      "vec_id", "embedding", maxBlock, planes)
    timed("e) full refined pruned (no __v)")(noop(refined.select(col("__g"), col("__sub"), col("__ovf"))))
    timed("g) withBits CARRYING __v (no store)")(noop(withBits.select(col("__g"), col("__v"))))
    timed("g2) withSub CARRYING __v (no store)")(noop(withSub.select(col("__g"), col("__sub"), col("__v"))))
    println(s"[embstage $n] refined final plan:\n" +
      refined.queryExecution.executedPlan.toString.split("\n").take(40).mkString("\n"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    timed("h2) full refined CARRYING __v, WSCG OFF")(noop(refined))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    timed("h) full refined CARRYING __v (no store)")(noop(refined))
  }

  /** Embedding-dedup/ANN rung (`runMain graft.DevProbe embfam [n]`):
    * n 64-dim vectors with a planted 1%-of-corpus EXACT-COPY family
    * (the unsplittable worst case for any sign-based split) pushed
    * through the round-6 bounded-block machinery — hyperplane blocks,
    * [[graft.operators.Similarity.refineOversizedBlocks]],
    * [[graft.operators.Similarity.boundedBlockPairs]] — watching the
    * two knobs the cap introduces: the LARGEST surviving block (must be
    * the copy family, flagged overflow) and the candidate-pair volume
    * (must stay ~linear: pairs/row bounded by max(maxBlock,
    * 2·overflowWindow), never n²). Then the IVF side: trained-centroid
    * assignment fan-out (max/mean rows per list) and one top-k probe. */
  /** Density-clustering rung (`runMain graft.DevProbe dbscanfam [n]`):
    * the embfam corpus shape (1% planted exact-copy family among
    * gaussians) blocked by hyperplane buckets, through the full
    * [[graft.operators.Clustering.dbscan]] chain at maxBlock=256.
    * Readouts: wall, role census, and whether the planted family
    * lands as ONE core cluster (identical vectors share every
    * bucket/sub-bucket, so the family must survive the blocking).
    *
    * `durable`: route every iterative-lineage cut through
    * [[graft.sources.IO.durableCheckpoint]] (reliable `df.checkpoint`
    * to a checkpoint dir) instead of `localCheckpoint` — the
    * multi-executor deployment mode `Dedup.connectedComponents`
    * documents; this run is the evidence that the CC/dbscan chain
    * converges identically and at what wall-cost through the durable
    * path. */
  private def dbscanFamilyProbe(spark: SparkSession, n: Long,
      durable: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.{Clustering, Similarity}
    val ckpt: DataFrame => DataFrame =
      if (durable) {
        val dir = s"/tmp/graft_ckpt_${System.nanoTime()}"
        println(s"[dbscanfam $n] DURABLE checkpoint dir: $dir")
        graft.sources.IO.durableCheckpoint(_, dir)
      } else _.localCheckpoint()
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dbscanfam $n] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dim = 64
    val family = Array.tabulate(dim)(i => (math.sin(i + 1.0) * 2.0).toFloat)
    val corpus = spark.range(n).map { i =>
      if (i % 100 == 0) (i, family.toSeq)
      else {
        val r = new scala.util.Random(i)
        (i, Seq.fill(dim)(r.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding").localCheckpoint()
    timed("generate+checkpoint")(corpus.count())
    val nPlanes = Similarity.planesFor(n, targetBucketSize = 64)
    val blocked = Similarity.hyperplaneBuckets(corpus, "embedding",
      nPlanes, seed = 42L, dim = dim)
    val out = timed("dbscan (block-scoped, maxBlock=256)") {
      ckpt(Clustering.dbscan(blocked, "vec_id", "embedding", "bucket",
        minCos = 0.95, minPts = 3, maxBlock = 256, dim = dim,
        checkpoint = ckpt))
    }
    val roles = timed("role census") {
      out.groupBy("role").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    println(s"[dbscanfam $n] roles: $roles")
    val fam = timed("planted-family readout") {
      out.where(col("id") % 100 === 0)
        .groupBy(col("cluster")).count()
        .orderBy(col("count").desc).limit(3).collect()
        .map(r => (if (r.isNullAt(0)) "null" else r.getLong(0).toString,
          r.getLong(1)))
    }
    println(s"[dbscanfam $n] planted family clusters (top): " +
      fam.mkString(", ") + s" (planted=${(n + 99) / 100})")
  }

  /** Alignment rung (`runMain graft.DevProbe procrustes [n]`): the
    * [[graft.operators.Alignment.fitProcrustes]] moment fit at
    * 16 dims over n rows — ONE dim² decimal aggregate is the entire
    * data-scale cost; readouts: wall, orthogonality defect, and max
    * deviation from the planted signed-permutation. */
  /** OPQ rung (`runMain graft.DevProbe opq [n]`): the full
    * [[graft.operators.ProductQuantization.trainOpq]] alternation at
    * 16 dims × n rows (m=4, k=8, iters=2, alternations=2) over a
    * corpus with planted cross-subspace correlation (the case OPQ
    * exists for), then one distortion-scoring pass. Every data-scale
    * stage is an already-audited shape — the readout is total wall per
    * phase plus the raw→OPQ distortion drop at scale. */
  private def opqProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.ProductQuantization
    val dim = 16
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      val z = Seq.fill(8)((r.nextGaussian() * 2.0).toFloat)
      val echo = z.map(v => v + (r.nextGaussian() * 0.1).toFloat)
      (i, z ++ echo)
    }.toDF("vec_id", "v").localCheckpoint()
    corpus.count()
    println(f"[opq $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val model = ProductQuantization.trainOpq(corpus, "vec_id", "v",
      dim, m = 4, k = 8, iters = 2, alternations = 2)
    println(f"[opq $n] trainOpq (2 alternations): ${(System.nanoTime() - t1) / 1e9}%.1f s" +
      f" orthErr=${model.orthErr}%.2e")
    val t2 = System.nanoTime()
    // gate-shaped scoring pass over the probe corpus
    val comps = model.rotation.map(w =>
      graft.functions.VectorExprs.dot(col("v"), typedLit(w)))
    def d2(vc: Column, codes: Column, pq: ProductQuantization.PQModel) = {
      val sub = pq.subDim
      (0 until pq.m).flatMap { j =>
        val cb = typedLit(pq.codebooks(j).map(_.toSeq).toSeq)
        (0 until sub).map { i =>
          val t = vc.getItem(j * sub + i).cast("double") -
            element_at(element_at(cb, codes.getItem(j) + 1), i + 1)
          t * t
        }
      }.reduce(_ + _)
    }
    val encoded = corpus
      .withColumn("__xr", array(comps: _*))
      .withColumn("__cr", ProductQuantization.encodeCodes(col("v"), model.raw))
      .withColumn("__co", ProductQuantization.encodeCodes(col("__xr"), model.opq))
    val out = encoded.agg(
      avg(d2(col("v"), col("__cr"), model.raw)).as("raw"),
      avg(d2(col("__xr"), col("__co"), model.opq)).as("opq")).head()
    println(f"[opq $n] distortion pass: ${(System.nanoTime() - t2) / 1e9}%.1f s " +
      f"raw=${out.getDouble(0)}%.5f opq=${out.getDouble(1)}%.5f")
    // the SERVE pass (q_x_opq_serve shape): rotate+encode+ADC top-10 in
    // one map-side scan into a bounded heap — the per-query number an
    // ANN deployment actually pays after training amortizes
    val t3 = System.nanoTime()
    val query = corpus.filter(col("vec_id") === 12345L)
      .select(col("v")).head().getSeq[Float](0).toArray
    val top = ProductQuantization.opqServeTopK(corpus, "vec_id", "v",
      model, query, topK = 10).collect()
    println(f"[opq $n] serve pass (rotate+encode+ADC top-10): " +
      f"${(System.nanoTime() - t3) / 1e9}%.1f s top1=${top.head.getLong(0)}")
  }

  /** Gram-fusion rung (`runMain graft.DevProbe gramfam [n]`): the
    * Gopher repetition battery over n total tokens (n/64 docs × 64
    * synthetic tokens, ~12% repeated so dup stats are non-trivial) —
    * the fused [[graft.functions.WordNGrams]] emission vs the
    * transform(sequence) HOF chain it replaced (CodegenFallback:
    * interpreted per-element dispatch). Both run the SAME downstream
    * count/window/aggregate; only the (n, gram) emission differs, so
    * the delta isolates the fusion. */
  private def gramFamProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nDocs = math.max(1L, n / 64)
    val docs = spark.range(nDocs).map { i =>
      val r = new scala.util.Random(i)
      val toks = (0 until 64).map { _ =>
        if (r.nextDouble() < 0.12) "dup" + r.nextInt(3)
        else "w" + r.nextInt(50000)
      }
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint()
    docs.count()
    val ns = Seq(2, 3, 4, 5)
    val toks = split(trim(col("text")), "\\s+")
    def downstream(grams: org.apache.spark.sql.DataFrame): Long =
      grams
        .groupBy(col("doc_id"), col("__g.__n").as("__n"), col("__g.gram").as("gram"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dups"))
        .agg(sum(col("dups"))).head().getLong(0)
    def timed(label: String)(body: => Long): Unit = {
      val t = System.nanoTime()
      val out = body
      println(f"[gramfam $n] $label: ${(System.nanoTime() - t) / 1e9}%.1f s (dup-gram occurrences $out)")
    }
    val base = docs.select(col("doc_id"), toks.as("__toks"))
    timed("fused WordNGrams") {
      downstream(base.select(col("doc_id"),
        explode(graft.functions.WordNGrams.column(col("__toks"), ns)).as("__g")))
    }
    def gramsHof(c: Column, n2: Int): Column =
      when(size(c) >= n2,
        transform(sequence(lit(1), size(c) - lit(n2) + lit(1)),
          i => struct(lit(n2).as("__n"),
            array_join(slice(c, i, lit(n2)), " ").as("gram"))))
        .otherwise(array().cast("array<struct<__n:int,gram:string>>"))
    timed("HOF transform chain") {
      downstream(base.select(col("doc_id"),
        explode(flatten(array(ns.map(gramsHof(col("__toks"), _)): _*))).as("__g")))
    }
  }

  /** Sampled-rotation-fit rung (`runMain graft.DevProbe opqsample [n]
    * [frac1,frac2,…]`): prices the standard production trade for OPQ
    * training — fit the rotation + codebooks on a seeded sample, ENCODE
    * the full corpus — against ONE full-corpus fit (the repo's `opq`
    * rung, 628.7 s at 10M in round 9, the slowest rung in the repo).
    * Readout per fraction: fit wall + that model's OPQ distortion over
    * the SAME full corpus — the distortion-delta curve is what each
    * wall reduction costs. Same planted-correlation corpus as
    * [[opqProbe]]. */
  private def opqSampleProbe(spark: SparkSession, n: Long,
      fracs: Seq[Double]): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.ProductQuantization
    val dim = 16
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      val z = Seq.fill(8)((r.nextGaussian() * 2.0).toFloat)
      val echo = z.map(v => v + (r.nextGaussian() * 0.1).toFloat)
      (i, z ++ echo)
    }.toDF("vec_id", "v").localCheckpoint()
    corpus.count()
    println(f"[opqsample $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // one full-corpus scoring pass per model: rotate + encode + mean
    // squared reconstruction error (the encode IS the production step a
    // sampled fit still pays in full — only the FIT is sampled)
    def d2(vc: Column, codes: Column, pq: ProductQuantization.PQModel) = {
      val sub = pq.subDim
      (0 until pq.m).flatMap { j =>
        val cb = typedLit(pq.codebooks(j).map(_.toSeq).toSeq)
        (0 until sub).map { i =>
          val t = vc.getItem(j * sub + i).cast("double") -
            element_at(element_at(cb, codes.getItem(j) + 1), i + 1)
          t * t
        }
      }.reduce(_ + _)
    }
    def distortion(model: ProductQuantization.OpqModel, label: String): Double = {
      val t = System.nanoTime()
      val comps = model.rotation.map(w =>
        graft.functions.VectorExprs.dot(col("v"), typedLit(w)))
      val scored = corpus
        .withColumn("__xr", array(comps: _*))
        .withColumn("__co", ProductQuantization.encodeCodes(col("__xr"), model.opq))
      val d = scored.agg(avg(d2(col("__xr"), col("__co"), model.opq))).head().getDouble(0)
      println(f"[opqsample $n] $label full-corpus distortion: $d%.5f " +
        f"(${(System.nanoTime() - t) / 1e9}%.1f s encode+score)")
      d
    }

    val t1 = System.nanoTime()
    val full = ProductQuantization.trainOpq(corpus, "vec_id", "v",
      dim, m = 4, k = 8, iters = 2, alternations = 2)
    val wFull = (System.nanoTime() - t1) / 1e9
    println(f"[opqsample $n] FULL fit: $wFull%.1f s orthErr=${full.orthErr}%.2e")
    val dFull = distortion(full, "full-fit")

    // price the whole curve against ONE full fit
    fracs.foreach { frac =>
      val t2 = System.nanoTime()
      val sampleDf = corpus.sample(withReplacement = false, frac, seed = 42L)
        .localCheckpoint()
      val sRows = sampleDf.count()
      val sampled = ProductQuantization.trainOpq(sampleDf, "vec_id", "v",
        dim, m = 4, k = 8, iters = 2, alternations = 2)
      val wSample = (System.nanoTime() - t2) / 1e9
      println(f"[opqsample $n] SAMPLED fit (frac=$frac%.3f, $sRows rows): " +
        f"$wSample%.1f s orthErr=${sampled.orthErr}%.2e " +
        f"(${wFull / wSample}%.1fx faster)")
      val dSample = distortion(sampled, f"sampled-fit frac=$frac%.3f")
      println(f"[opqsample $n] frac=$frac%.3f distortion delta: " +
        f"${(dSample - dFull) / dFull * 100.0}%.2f%% for a " +
        f"${wFull / wSample}%.1fx fit-wall reduction")
    }
  }

  /** PageRank per-iteration bisect (`runMain graft.DevProbe prbisect
    * [dir]`): the sf1 scale sweep measured q_x_pagerank at 16.6x for
    * 10x edges — this rung times each iteration's checkpoint boundary
    * over the same lineitem-derived graph to separate a growing
    * per-iteration cost (lineage/pinned-block pathology) from a flat
    * one (genuine per-iteration shuffle volume). */
  private def prBisect(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val e = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((-col("l_suppkey")).as("src"), col("l_partkey").as("dst"))
    println(f"[prbisect] edges=${e.count()} load: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    var last = System.nanoTime()
    var i = 0
    val cp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      val r = df.localCheckpoint()
      i += 1
      println(f"[prbisect] iter $i: ${(System.nanoTime() - last) / 1e9}%.2f s")
      last = System.nanoTime()
      r
    }
    val t1 = System.nanoTime()
    val out = graft.operators.Graph.pageRank(spark, e, iters = 5, cp)
      .orderBy(col("rank").desc, col("node")).limit(30).collect()
    println(f"[prbisect] total: ${(System.nanoTime() - t1) / 1e9}%.1f s top=${out.head.mkString(",")}")
  }

  /** Old-vs-new mutual-NN formulation A/B (`runMain graft.DevProbe
    * mnnab [n] [blocks] [dim]`): the round-12 rewrite (score each pair
    * once + explode directions + count==2 mutual check) against the
    * pre-round-12 shape (two directed projections unioned + a top1
    * self-join), interleaved twice in ONE JVM on a synthetic blocked
    * corpus shaped like q_x_pipeline3 at sf1. Outputs must match
    * exactly. */
  private def mnnAb(spark: SparkSession, n: Int, blocks: Int,
      dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sim = graft.operators.Similarity
    val df = spark.range(n.toLong).select(col("id").as("vec_id"),
        (col("id") % blocks).cast("int").as("cid"),
        transform(sequence(lit(1), lit(dim)), i =>
          (sin(col("id") * i * 0.7) + cos(col("id") + i)).cast("float"))
          .as("v"))
      .localCheckpoint()
    def noop(d: org.apache.spark.sql.DataFrame): Long = {
      d.write.format("noop").mode("overwrite").save(); 0L
    }
    val planes = sim.subBucketPlanes(dim)
    def oldMnn(): org.apache.spark.sql.DataFrame = {
      val refined = sim.refineOversizedBlocks(df, "cid", "vec_id", "v",
        4096, planes)
      val und = sim.boundedBlockPairs(refined, 16, planes.last)
      val scored = und
        .select(col("__g"), col("id1").as("__ida"), col("id2").as("__idb"),
          round(graft.functions.VectorExprs.cosine(col("v1"), col("v2")), 6)
            .as("cos"))
        .unionByName(und
          .select(col("__g"), col("id2").as("__ida"), col("id1").as("__idb"),
            round(graft.functions.VectorExprs.cosine(col("v2"), col("v1")), 6)
              .as("cos")))
      val w = Window.partitionBy(col("__g"), col("__ida"))
        .orderBy(col("cos").desc, col("__idb"))
      val top1 = scored.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__g"), col("__ida"), col("__idb"), col("cos"))
      top1.alias("x").join(top1.alias("y"),
          col("x.__ida") === col("y.__idb") &&
            col("x.__idb") === col("y.__ida"))
        .where(col("x.__ida") < col("x.__idb"))
        .select(col("x.__g").as("cid"), col("x.__ida").as("id1"),
          col("x.__idb").as("id2"), col("x.cos").as("cos"))
    }
    def newMnn(): org.apache.spark.sql.DataFrame =
      sim.mutualNearestPairs(df, "vec_id", "v", "cid", maxBlock = 4096,
        dim = dim)
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      noop(oldMnn())
      println(f"[mnnab] r$r old: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      noop(newMnn())
      println(f"[mnnab] r$r new: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val a = oldMnn().orderBy(col("id1"), col("id2")).collect().toSeq
    val b = newMnn().orderBy(col("id1"), col("id2")).collect().toSeq
    println(s"[mnnab] rows old=${a.size} new=${b.size} equal=${a == b}")
  }

  /** MinHash-LSH chain bisect (`runMain graft.DevProbe lshbisect
    * [dir]`): stage-times the q_x_cluster_split/dup_clusters chain —
    * candidates, verified pairs, connected components — each run twice
    * in the same JVM (warm number is the honest one on this host). */
  private def lshBisect(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[lshbisect] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (round <- 1 to 2) {
      time(s"r$round candidates") {
        val sh = d.select(col("doc_id"),
          graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
        val sig = sh.select(col("doc_id"),
          graft.operators.Dedup.minhashSignature(col("sh"), 64).as("sig"))
        noop(graft.operators.Dedup.lshCandidates(
          graft.operators.Dedup.lshBands(sig, "doc_id", "sig", 64, 16),
          "doc_id"))
      }
      time(s"r$round neardups") {
        noop(graft.operators.Dedup.minhashNearDups(d, "doc_id", "text"))
      }
      time(s"r$round clusters") {
        noop(graft.operators.Dedup.nearDupClusters(d, "doc_id", "text"))
      }
    }
  }

  /** HITS per-half-step bisect (`runMain graft.DevProbe hitsbisect
    * [dir]`): times every half-step's checkpoint boundary over the
    * q_x_hits mod-50 lineitem graph — separates the one-time adjacency
    * build from the steady per-half-step cost (and shows whether the
    * dst-side gather re-shuffles the cached src-partitioned adjacency
    * each round). */
  private def hitsBisect(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % 50).as("src"),
        (col("l_partkey") % 50).as("dst"))
      .where(col("src") =!= col("dst"))
    var last = System.nanoTime()
    var i = 0
    val cp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      val r = df.localCheckpoint()
      i += 1
      println(f"[hitsbisect] half-step $i: ${(System.nanoTime() - last) / 1e9}%.2f s")
      last = System.nanoTime()
      r
    }
    val t1 = System.nanoTime()
    val out = graft.operators.Graph.hits(spark, e, iters = 3, cp)
      .orderBy(col("node")).collect()
    println(f"[hitsbisect] total: ${(System.nanoTime() - t1) / 1e9}%.1f s rows=${out.length}")
  }

  /** BPE learn-loop rung (`runMain graft.DevProbe bpe [n] [merges]`):
    * prices the per-round cache of the evolving symbolized word table —
    * without it, merge round k re-derives a k-deep replace chain over
    * the vocabulary (O(merges²) replace work total), the exact
    * re-derivation class materializeDedup closed for the corpus
    * pipeline. Synthetic zipf-ish corpus; same learn() both ways
    * (checkpointEvery=1 vs 0), identical merge lists asserted. */
  /** q_x_pipeline4 stage bisect (`runMain graft.DevProbe p4bisect
    * [dir]`): the gate chains corpus-plant → block census → mutual-NN
    * dedup → anti-join survivors (localCheckpoint) → greedy k-center;
    * at the sf1 sweep it is the most expensive gate (86.9 s, ratio
    * 10.24 — linear, but linear-at-the-top deserves a decomposition
    * the way pagerank's 16.6× did). Times each stage against ONE
    * materialized upstream so per-stage walls don't compound. */
  private def p4Bisect(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val sim = graft.operators.Similarity
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[p4bisect $dir] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding")
    val corpus = timed("stage 0: corpus plant + localCheckpoint") {
      val c = e.unionByName(e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000L).as("vec_id"), col("label"),
          col("embedding"))).localCheckpoint()
      c.count(); c
    }
    timed("stage 1: requireBlocksWithin census") {
      sim.requireBlocksWithin(corpus, "label", 4096, "p4bisect")
    }
    val drops = timed("stage 2: mutual-NN pairs -> drops (collect to cut)") {
      val d = sim.mutualNearestPairs(corpus, "vec_id", "embedding",
          "label", maxBlock = 4096, dim = 64)
        .where(col("cos") >= 0.99)
        .select(col("id1").as("vec_id")).distinct().localCheckpoint()
      d.count(); d
    }
    timed("stage 2b: same MNN, maxBlock=256 (refinement bounds the quadratic)") {
      sim.mutualNearestPairs(corpus, "vec_id", "embedding",
          "label", maxBlock = 256, dim = 64)
        .where(col("cos") >= 0.99)
        .select(col("id1")).distinct().count()
    }
    val survivors = timed("stage 3: anti-join survivors + localCheckpoint") {
      val s = corpus.join(drops, Seq("vec_id"), "left_anti")
        .select("vec_id", "embedding").localCheckpoint()
      s.count(); s
    }
    timed("stage 4: farthestFirst k=8 (8 selection rounds)") {
      graft.operators.Selection.farthestFirst(
          survivors, "vec_id", "embedding", k = 8)
        .orderBy(col("rank")).collect().length
    }
  }

  /** q_x_kmeans cost split (`runMain graft.DevProbe kmeansbisect [dir]
    * [iters]`): the gate is 2.2 s at sf0.1 over a 2,000-row corpus —
    * obviously not compute. Splits each iteration's wall into PLANNING
    * (analyze/optimize/plan the 65-column decimal aggregate) vs
    * EXECUTION (the collect), plus the end-to-end kMeans wall, twice in
    * one JVM (cold plan-cache, then warm). */
  private def kmeansBisect(spark: SparkSession, dir: String,
      iters: Int): Unit = {
    import graft.operators.Clustering
    import graft.functions.VectorExprs
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    emb.count()
    val dim = 64
    def assignCol(cents: Array[(Int, Array[Double])]) =
      VectorExprs.nearestCentroid(col("v"), cents.map(_._2))
    for (rep <- 1 to 2) {
      var cents: Array[(Int, Array[Double])] = emb.orderBy(col("vid")).limit(8)
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
      var planNs = 0L; var execNs = 0L
      val t0 = System.nanoTime()
      for (_ <- 1 to iters) {
        val df = emb
          .select(assignCol(cents).as("cid"), col("v"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (0 until dim).map(i =>
              sum(col("v").getItem(i).cast("decimal(38,9)")).as(s"s$i")): _*)
          .select(col("cid") +: (0 until dim).map(i =>
            round(col(s"s$i").cast("double") / col("n").cast("double"), 12)
              .as(s"c$i")): _*)
        val p0 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        planNs += System.nanoTime() - p0
        val e0 = System.nanoTime()
        val sums = df.collect()
          .map(r => r.getInt(0) -> Array.tabulate(dim)(p => r.getDouble(p + 1)))
          .toMap
        execNs += System.nanoTime() - e0
        cents = cents.map { case (cid, cv) => (cid, sums.getOrElse(cid, cv)) }
      }
      println(f"[kmeansbisect $dir rep$rep] total=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"plan=${planNs / 1e9}%.2f s exec=${execNs / 1e9}%.2f s")
    }
    val t1 = System.nanoTime()
    Clustering.kMeans(spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", 8, dim, iters)
      .assignments.write.format("noop").mode("overwrite").save()
    println(f"[kmeansbisect $dir] full kMeans+assignments noop: ${(System.nanoTime() - t1) / 1e9}%.2f s")
  }

  /** MNN stage-2 decomposition (`runMain graft.DevProbe mnnstage [dir]
    * [maxBlock]`): the p4bisect rung names stage 2 (mutual-NN pairs) as
    * the sf1 wall (42.9 s of 57.5); this times the SUB-stages of that
    * stage against one materialized corpus — candidate pair volume and
    * generation, +cosine scoring, +directed explode, +top-1 window —
    * so the fix targets the dominant sub-stage, not a guess. Each rung
    * replicates rankedNeighbors' exact expressions. */
  private def mnnStageProbe(spark: SparkSession, dir: String,
      maxBlock: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Similarity
    import graft.functions.VectorExprs
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[mnnstage $dir/$maxBlock] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding")
    val corpus = e.unionByName(e.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000L).as("vec_id"), col("label"),
        col("embedding"))).localCheckpoint()
    corpus.count()
    val planes = Similarity.subBucketPlanes(64)
    def refined = Similarity.refineOversizedBlocks(corpus, "label",
      "vec_id", "embedding", maxBlock, planes)
    def und = Similarity.boundedBlockPairs(refined, 16, planes.last)
    timed("a: refine census only")(noop(refined))
    val nPairs = timed("b: candidate pair count")(und.count())
    println(s"[mnnstage $dir/$maxBlock]    pairs = $nPairs")
    timed("c: pairs, full noop (materialize pair rows + vectors)")(noop(und))
    def scored = und
      .select(col("__g"),
        round(VectorExprs.cosine(col("v1"), col("v2")), 6).as("cos"),
        explode(array(
          struct(col("id1").as("a"), col("id2").as("b")),
          struct(col("id2").as("a"), col("id1").as("b")))).as("__dir"))
      .select(col("__g"), col("__dir.a").as("__ida"),
        col("__dir.b").as("__idb"), col("cos"))
    timed("d: + cosine + directed explode")(noop(scored))
    val w = Window.partitionBy(col("__g"), col("__ida"))
      .orderBy(col("cos").desc,
        coalesce(col("__idb"), lit(Long.MinValue)).asc)
    timed("e: + top-1 (rn == 1; TopK-rewritten)")(
      noop(scored.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)))
    timed("f: full mutualNearestPairs")(
      noop(Similarity.mutualNearestPairs(corpus, "vec_id", "embedding",
        "label", maxBlock = maxBlock, dim = 64)))
  }

  /** Gate-scale cadence adjudicator (`runMain graft.DevProbe bpegate
    * [sfDir] [merges]`): times [[graft.operators.Bpe.learn]] on the
    * ACTUAL gate input (documents.parquet) at gate merge depth,
    * alternating checkpoint cadences within ONE JVM so window noise
    * hits both arms — the r11 bench read q_x_bpe_encode at 2.3× and
    * could not tell the new per-round checkpoint from the contended
    * window; this can. */
  private def bpeGateProbe(spark: SparkSession, sfDir: String,
      merges: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    docs.count()
    def run(cadence: Int): Double = {
      val t0 = System.nanoTime()
      val out = graft.operators.Bpe.learn(docs, "text", merges, cadence)
      require(out.size == merges, s"expected $merges merges, got ${out.size}")
      (System.nanoTime() - t0) / 1e9
    }
    run(0) // warm-up, untimed
    val reps = 5
    val arms = Seq(0 -> "never", 1 -> "per-round")
    val walls = (1 to reps).flatMap(_ => arms.map { case (c, lbl) =>
      (lbl, run(c))
    })
    arms.foreach { case (_, lbl) =>
      val xs = walls.filter(_._1 == lbl).map(_._2).sorted
      println(f"[bpegate $sfDir/$merges] $lbl%-9s min=${xs.min}%.2f s " +
        f"median=${xs(xs.size / 2)}%.2f s (all: ${xs.map(x => f"$x%.2f").mkString(", ")})")
    }
  }

  private def bpeProbe(spark: SparkSession, n: Long, merges: Int): Unit = {
    import spark.implicits._
    val t0 = System.nanoTime()
    // ~40k-word synthetic vocabulary with zipf-ish repetition: doc i
    // holds 12 words drawn deterministically, word w = base-26 digits
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      val words = (0 until 12).map { _ =>
        val z = (math.pow(r.nextDouble(), 3.0) * 40000).toInt // skewed
        java.lang.Integer.toString(z + 10, 26).flatMap(c =>
          ('a' + java.lang.Character.digit(c, 26)).toChar.toString)
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint()
    corpus.count()
    println(f"[bpe $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def run(label: String, checkpointEvery: Int): Seq[(Int, String, String, Long)] = {
      val t = System.nanoTime()
      val out = graft.operators.Bpe.learn(corpus, "text", merges, checkpointEvery)
      println(f"[bpe $n] $label: ${(System.nanoTime() - t) / 1e9}%.1f s " +
        f"(${out.size} merges learned)")
      out
    }
    val chained = run(s"$merges merges, NO per-round checkpoint (k-deep chains)", 0)
    val cached = run(s"$merges merges, per-round localCheckpoint", 1)
    require(chained == cached, "checkpoint cadence changed the merge list")
    println(s"[bpe $n] merge lists identical across cadences")
  }

  /** Keep-better-policy rung (`runMain graft.DevProbe opqpolicy [n]
    * [frac]`): drives the PRODUCTIZED [[ProductQuantization.trainOpqSampled]]
    * end-to-end on the planted-correlation fixture — the `opqsample`
    * rung priced the raw curve (fit wall vs distortion delta, round
    * 10); this rung confirms the shipped API delivers it: sampled fit
    * wall vs full fit wall, both full-corpus distortions, and the
    * policy's pick (which can NEVER be worse than `previous` — the
    * guard the non-monotone sample curve made necessary). */
  private def opqPolicyProbe(spark: SparkSession, n: Long, frac: Double): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.ProductQuantization
    val dim = 16
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      val z = Seq.fill(8)((r.nextGaussian() * 2.0).toFloat)
      val echo = z.map(v => v + (r.nextGaussian() * 0.1).toFloat)
      (i, z ++ echo)
    }.toDF("vec_id", "v").localCheckpoint()
    corpus.count()
    println(f"[opqpolicy $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val full = ProductQuantization.trainOpq(corpus, "vec_id", "v",
      dim, m = 4, k = 8, iters = 2, alternations = 2)
    val wFull = (System.nanoTime() - t1) / 1e9
    println(f"[opqpolicy $n] FULL fit ('previous' model): $wFull%.1f s")

    val t2 = System.nanoTime()
    val choice = ProductQuantization.trainOpqSampled(corpus, "vec_id", "v",
      dim, m = 4, k = 8, iters = 2, alternations = 2,
      frac = frac, seed = 42L, previous = Some(full))
    val wPolicy = (System.nanoTime() - t2) / 1e9
    println(f"[opqpolicy $n] trainOpqSampled(frac=$frac%.3f, " +
      f"${choice.sampleRows} rows): $wPolicy%.1f s total " +
      f"(fit+2 scoring passes) — ${wFull / wPolicy}%.1fx vs full fit")
    println(f"[opqpolicy $n] distortions: sampled=${choice.sampledDistortion}%.5f " +
      f"previous=${choice.previousDistortion.get}%.5f " +
      f"published=${choice.distortion}%.5f keptSampled=${choice.keptSampled}")
    val delta = (choice.sampledDistortion - choice.previousDistortion.get) /
      choice.previousDistortion.get * 100.0
    println(f"[opqpolicy $n] sampled-vs-previous delta: $delta%+.2f%% " +
      "(policy publishes the min — never worse than previous)")
  }

  /** Isotonic-APPLY rung (`runMain graft.DevProbe calibrate [n]`): maps
    * n scores through a 256-bin fitted step function, fused
    * StepFloorLookup vs the CodegenFallback HOF twin — the round-9
    * fused-vs-HOF evidence for the serving path (the quantizer rung's
    * sibling: the HOF drops the WHOLE projection to interpreted eval,
    * which a 9-bin sf0.1 gate can't see). */
  private def calibrateProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Calibration
    val bins = 256
    val fit = (0 until bins).map(i => (i / bins.toDouble, (i / bins.toDouble) * 0.9))
    val t0 = System.nanoTime()
    val scores = spark.range(n)
      .select((pmod(xxhash64(col("id")), lit(1000000L)) / lit(1000000.0)).as("s"))
      .localCheckpoint()
    scores.count()
    println(f"[calibrate $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def drain(c: Column, label: String): Double = {
      val t = System.nanoTime()
      scores.select(c.as("c"))
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t) / 1e9
      println(f"[calibrate $n] $label: $w%.1f s")
      w
    }
    drain(Calibration.calibrateColumn(col("s"), fit), "fused warmup")
    val fused = drain(Calibration.calibrateColumn(col("s"), fit), "fused (StepFloorLookup)")
    val hof = drain(Calibration.calibrateColumnHof(col("s"), fit), "hof (filter+element_at)")
    println(f"[calibrate $n] hof/fused ratio: ${hof / fused}%.1f x")
  }

  /** JL-projection rung (`runMain graft.DevProbe jl [n]`): projects n
    * 16-dim vectors to 4 dims, fused JlProject vs the CodegenFallback
    * zip_with/aggregate twin — the fused-vs-HOF evidence for the
    * round-9 fusion (sibling of the calibrate rung). */
  private def jlProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Projection
    val t0 = System.nanoTime()
    val df = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(16)(r.nextGaussian()))
    }.toDF("id", "v").localCheckpoint()
    df.count()
    println(f"[jl $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def drain(out: org.apache.spark.sql.DataFrame, label: String): Double = {
      val t = System.nanoTime()
      out.select(col("proj"))
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t) / 1e9
      println(f"[jl $n] $label: $w%.1f s")
      w
    }
    drain(Projection.randomProject(df, "v", 16, 4, "probe"), "fused warmup")
    val fused = drain(Projection.randomProject(df, "v", 16, 4, "probe"),
      "fused (JlProject)")
    val hof = drain(Projection.randomProjectHof(df, "v", 16, 4, "probe"),
      "hof (zip_with+aggregate)")
    println(f"[jl $n] hof/fused ratio: ${hof / fused}%.1f x")
  }

  /** Recall-panel rung (`runMain graft.DevProbe recallfam [n]`): the
    * q_x_ivf_recall_panel shape at scale — 8 queries × 32 centroids ×
    * n 16-dim vectors, nprobe ladder 1/2/4/8 — pricing the
    * query-independent assignment pass + broadcast-panel scoring +
    * salted per-(query, list) top-k. */
  private def recallFamilyProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 16
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(dim)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "v").localCheckpoint()
    corpus.count()
    println(f"[recallfam $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val cents = (0 until 32).map { c =>
      val r = new scala.util.Random(c + 1000)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    val queries = corpus.filter(col("vec_id") % (n / 8) === 3)
    val t1 = System.nanoTime()
    val curve = Similarity.ivfRecallCurveBatch(corpus, "vec_id", "v",
      cents, queries, "vec_id", "v", k = 10, Seq(1, 2, 4, 8))
      .collect()
    println(f"[recallfam $n] panel curve (8 queries, 32 lists): " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s")
    curve.sortBy(_.getAs[Int]("nprobe")).foreach { r =>
      println(f"[recallfam $n]   nprobe=${r.getAs[Int]("nprobe")}%d " +
        f"cand=${r.getAs[Long]("cand_total")}%d " +
        f"recall=${r.getAs[Double]("mean_recall")}%.3f")
    }
  }

  /** KMV-sketch rung (`runMain graft.DevProbe kmvfam [n]`): n rows over
    * 64 groups with ~n/6 distinct values per group — the
    * high-cardinality slice census. Times the bounded-shuffle KmvAgg at
    * k ∈ {256, 1024} against exact count(DISTINCT) and reports estimate
    * relative error — the scale evidence for the round-8 aggregate
    * family (its O(log k) TreeSet update is the whole 100 TB claim). */
  private def kmvFamilyProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.SetSketch
    val t0 = System.nanoTime()
    // ~n/6 distinct hash values per group, uniform on [0, 2^60)
    val df = spark.range(n).select(
      (col("id") % 64).as("g"),
      pmod(xxhash64((col("id") / 6).cast("long")), lit(1L << 60)).as("h"))
      .localCheckpoint()
    df.count()
    println(f"[kmvfam $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val exact = df.groupBy(col("g"))
      .agg(countDistinct(col("h")).as("exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"[kmvfam $n] exact countDistinct: ${(System.nanoTime() - t1) / 1e9}%.1f s " +
      f"(mean group cardinality ${exact.values.sum / exact.size}%d)")
    for (k <- Seq(256, 1024)) {
      val t = System.nanoTime()
      val est = df.groupBy(col("g"))
        .agg(SetSketch.kmvSketch(col("h"), k).as("sk"))
        .select(col("g"), SetSketch.estimateDistinct(col("sk"), k).as("est"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val wall = (System.nanoTime() - t) / 1e9
      val relErrs = exact.map { case (g, ex) =>
        math.abs(est(g) - ex) / ex.toDouble }
      println(f"[kmvfam $n] kmv k=$k%d: $wall%.1f s " +
        f"meanRelErr=${relErrs.sum / relErrs.size}%.4f maxRelErr=${relErrs.max}%.4f " +
        f"(theory ~ 1/sqrt(k) = ${1.0 / math.sqrt(k)}%.4f)")
    }
  }

  /** OPQ SERVE cost rung (`runMain graft.DevProbe opqserve [n]`): times
    * the q_x_opq_serve shape — rotate+encode+ADC top-10 in one map-side
    * scan — at n rows, against a SYNTHETIC model (signed-permutation
    * rotation, grid codebooks): serve wall depends on model SIZES, not
    * trained values, so this prices the per-query scan without the
    * ~10-minute training the `opq` rung pays. */
  private def opqServeProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.ProductQuantization
    val dim = 16; val m = 4; val k = 8; val sub = dim / m
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(dim)((r.nextGaussian() * 2.0).toFloat))
    }.toDF("vec_id", "v").localCheckpoint()
    corpus.count()
    println(f"[opqserve $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val rotation = Array.tabulate(dim, dim)((j, i) =>
      if (i == dim - j - 1) (if (j % 2 == 0) 1.0f else -1.0f) else 0.0f)
    val books = Array.tabulate(m, k, sub)((_, c, i) =>
      -3.5 + c + 0.1 * i) // spread grid — any deterministic values work
    val model = ProductQuantization.OpqModel(dim, rotation,
      ProductQuantization.PQModel(dim, m, books),
      ProductQuantization.PQModel(dim, m, books), 0.0)
    val query = corpus.filter(col("vec_id") === 12345L)
      .select(col("v")).head().getSeq[Float](0).toArray
    def serveOnce(label: String): Unit = {
      val t = System.nanoTime()
      val top = ProductQuantization.opqServeTopK(corpus, "vec_id", "v",
        model, query, topK = 10).collect()
      println(f"[opqserve $n] $label rotate+encode+ADC top-10: " +
        f"${(System.nanoTime() - t) / 1e9}%.1f s top1=${top.head.getLong(0)}")
    }
    serveOnce("warmup")
    serveOnce("serve")
    serveOnce("serve")
  }

  private def procrustesProbe(spark: SparkSession, n: Long): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Alignment
    val dim = 16
    val t0 = System.nanoTime()
    val corpus = spark.range(n).map { i =>
      val r = new scala.util.Random(i)
      val x = Seq.fill(dim)(r.nextGaussian().toFloat)
      val y = (1 to dim).map(j =>
        if (j % 2 == 1) x(dim - j) else -x(dim - j))
      (i, x, y)
    }.toDF("id", "x", "y").localCheckpoint()
    corpus.count()
    println(f"[procrustes $n] generate+checkpoint: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val m = Alignment.fitProcrustes(corpus, "x", "y", dim)
    println(f"[procrustes $n] moment fit + solve: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    // planted A[j][k] = s_j [k = dim - j - 1] (0-based), s_j = +/- alt
    var maxDev = 0.0
    for (j <- 0 until dim; k <- 0 until dim) {
      val target = if (k == dim - j - 1) (if (j % 2 == 0) 1.0 else -1.0)
        else 0.0
      maxDev = math.max(maxDev, math.abs(m.rotation(j)(k) - target))
    }
    println(f"[procrustes $n] orthErr=${m.orthErr}%.2e maxDev=$maxDev%.2e n=${m.n}")
  }

  private def embFamilyProbe(spark: SparkSession, n: Long,
      skipPairs: Boolean = false, quantized: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.{Quantization, Similarity}
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[embfam $n] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dim = 64
    val family = Array.tabulate(dim)(i => (math.sin(i + 1.0) * 2.0).toFloat)
    val corpusF = spark.range(n).map { i =>
      if (i % 100 == 0) (i, family.toSeq)
      else {
        val r = new scala.util.Random(i)
        (i, Seq.fill(dim)(r.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding")
    // `sq`: int8-quantize BEFORE caching — the whole dedup chain then
    // stores/shuffles array<tinyint> (~4× smaller; asFloatVec casts are
    // ephemeral inside the plane dots). This is what fits the 100M
    // pairs pass on this VM's shuffle disk: ~60 GB of float pair
    // shuffle becomes ~18 GB of codes.
    val corpus = (if (quantized)
      corpusF.select(col("vec_id"),
        Quantization.quantizeFused(col("embedding")).as("embedding"))
    else corpusF).cache()
    if (quantized) println(s"[embfam $n] QUANTIZED (int8 codes) chain")
    timed("generate+cache")(corpus.count())

    // hyperplane blocks sized for ~64-row buckets, then the cap
    val nPlanes = Similarity.planesFor(n, targetBucketSize = 64)
    val blocked = timed("hyperplane blocking") {
      val b = Similarity.hyperplaneBuckets(corpus, "embedding", nPlanes,
        seed = 42L, dim = dim)
      b.groupBy("bucket").count().agg(max("count")).head().getLong(0)
    }
    println(s"[embfam $n] planes=$nPlanes largest raw bucket=$blocked")

    val planes = Similarity.subBucketPlanes(dim)
    // localCheckpoint, NOT .cache(): the columnar InMemoryRelation batch
    // builder degrades to ~200µs/row on this 5-column vector-bearing
    // shape at ≥30M rows (bisected via `embstage`; all 32 threads pinned
    // in DefaultCachedBatchSerializer.next) — row-format checkpoint
    // storage materializes the same relation at memcpy speed
    val refined = Similarity.refineOversizedBlocks(
      Similarity.hyperplaneBuckets(corpus, "embedding", nPlanes, 42L, dim),
      "bucket", "vec_id", "embedding", maxBlock = 256, planes)
      .localCheckpoint()
    println(s"[embfam $n] refined join nodes: " +
      refined.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.take(90)).mkString(" | "))
    timed("refine census") {
      val top = refined.groupBy("__g", "__sub", "__ovf").count()
        .orderBy(col("count").desc).limit(3).collect()
      println(s"[embfam $n] top refined blocks: " + top.map(r =>
        s"(ovf=${r.getBoolean(2)}, n=${r.getLong(3)})").mkString(", "))
    }
    // ONE pass over the candidate pairs for BOTH readouts (count +
    // dropped near-dups): the fit⋈fit join's shuffle is the dominant
    // disk cost at the 100M rung — a second boundedBlockPairs action
    // doubles it past the machine's disk. count(DISTINCT id2 | cos ≥
    // .99) ≡ the groupBy(id2) drop count, and the partial-distinct
    // map-side combine keeps the agg shuffle tiny.
    // `nopairs` skips the fit⋈fit pair shuffle — the one stage whose
    // disk need (~2·n·300 B, poorly-compressible floats) exceeds THIS
    // VM past ~50M rows; a real cluster's shuffle space is not the
    // binding constraint there (linear bytes, 128+ reducers)
    if (skipPairs) {
      println(s"[embfam $n] pairs pass SKIPPED (nopairs)")
    } else {
    val (pairs, dropped) = timed("pairs census + near-dup reduce (one pass)") {
      def f(c: Column) = if (quantized) c.cast("array<float>") else c
      val r = Similarity.boundedBlockPairs(refined, overflowWindow = 16, planes.last)
        .withColumn("__cos",
          graft.functions.VectorExprs.cosine(f(col("v1")), f(col("v2"))))
        .agg(count(lit(1)).as("pairs"),
          countDistinct(when(col("__cos") >= 0.99, col("id2"))).as("dropped"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    println(f"[embfam $n] candidate pairs=$pairs (${pairs.toDouble / n}%.1f per row)")
    println(s"[embfam $n] dropped near-dups=$dropped (planted=${n / 100 - 1})")
    }
    // (no unpersist: localCheckpoint storage isn't released by
    // Dataset.unpersist — the checkpointed blocks free with the probe
    // JVM; the IVF phase below reads only `corpus`)

    // IVF fan-out: trained coarse quantizer, assignment skew, one probe.
    // The k-means/assignment expressions are float-typed; in sq mode the
    // cached codes cast back map-side (cosine is scale-invariant, so the
    // trained lists are the same geometry).
    val corpusIvf = if (quantized)
      corpus.select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    else corpus
    val cents = timed("trainCentroids k=64") {
      Similarity.trainCentroids(corpusIvf, "embedding", k = 64).cache()
    }
    val assigned = Similarity.ivfAssign(corpusIvf, "vec_id", "embedding", cents)
      .cache()
    timed("ivfAssign fan-out") {
      val f = assigned.groupBy("cid").count()
        .agg(max("count"), avg("count")).head()
      println(f"[embfam $n] ivf list max=${f.getLong(0)} mean=${f.getDouble(1)}%.0f")
    }
    timed("ivfTopK probe (nprobe=2)") {
      Similarity.ivfTopK(assigned, "vec_id", "embedding", cents,
        family, k = 10, nprobe = 2).collect().length
    }
    assigned.unpersist(); cents.unpersist(); corpus.unpersist()
  }
}
