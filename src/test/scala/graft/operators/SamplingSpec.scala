package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic sampling/splitting: reproducibility across partition
  * layouts, monotonicity in the fraction, leakage-safe group folds. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 2000L).map(i => (i, s"grp${i % 37}"))

  test("hashSample is layout-independent and roughly unbiased") {
    val df1 = rows.toDF("id", "g")                       // one layout
    val df8 = rows.toDF("id", "g").repartition(8)        // another
    val s1 = Sampling.hashSample(df1, "id", 0.25, "s").select("id")
      .as[Long].collect().toSet
    val s8 = Sampling.hashSample(df8, "id", 0.25, "s").select("id")
      .as[Long].collect().toSet
    assert(s1 == s8, "sample changed with partitioning")
    assert(math.abs(s1.size / 2000.0 - 0.25) < 0.05, s"biased: ${s1.size}")
  }

  test("hashSample is monotone in the fraction and salt-independent draws differ") {
    val df = rows.toDF("id", "g")
    val s10 = Sampling.hashSample(df, "id", 0.10, "s").select("id").as[Long].collect().toSet
    val s30 = Sampling.hashSample(df, "id", 0.30, "s").select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s30), "growing the fraction churned the sample")
    val other = Sampling.hashSample(df, "id", 0.10, "t").select("id").as[Long].collect().toSet
    assert(s10 != other, "different salts must draw different samples")
  }

  test("hashSample edge fractions keep nothing / everything") {
    val df = rows.toDF("id", "g")
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(df, "id", 1.0).count() == 2000)
  }

  test("groupSplit never splits a group across folds and covers all cuts") {
    val df = rows.toDF("id", "g")
    val folded = Sampling.groupSplit(df, "g", Seq(0.5, 0.75), "s")
    val perGroup = folded.groupBy("g")
      .agg(countDistinct(col("fold")).as("nf"))
      .agg(max(col("nf"))).head().getLong(0)
    assert(perGroup == 1L, "a group straddled folds")
    val folds = folded.select("fold").distinct().as[Int].collect().toSet
    assert(folds.subsetOf(Set(0, 1, 2)))
    assert(folds.contains(0) && folds.contains(2), s"degenerate split: $folds")
  }

  test("null keys are sampled and folded like any other key value") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("b")))
      .toDF("id", "g")
    // fraction 1.0 keeps EVERY row — null keys must not silently vanish
    assert(Sampling.hashSample(df, "g", 1.0).count() == 4)
    // null is one key value: both null rows share a fate at any fraction
    (1 to 20).foreach { i =>
      val kept = Sampling.hashSample(df, "g", 0.5, s"salt$i")
        .select("id").as[Long].collect().toSet
      assert(kept.contains(2L) == kept.contains(3L),
        s"null-keyed rows split fates at salt$i: $kept")
    }
    // groupSplit: null groups land together in ONE deterministic fold
    val folds = Sampling.groupSplit(df, "g", Seq(0.5))
      .filter(col("id").isin(2L, 3L))
      .select("fold").as[Int].collect().toSet
    assert(folds.size == 1)
  }

  test("stratifiedHashSample applies per-stratum fractions; unlisted strata drop") {
    val df = rows.toDF("id", "g") // g = grp0..grp36
    val kept = Sampling.stratifiedHashSample(df, "g", "id",
      Map("grp0" -> 1.0, "grp1" -> 0.0, "grp2" -> 0.5), "s")
    val byStratum = kept.groupBy("g").count()
      .as[(String, Long)].collect().toMap
    val grp0Total = rows.count(_._2 == "grp0")
    assert(byStratum("grp0") == grp0Total)          // fraction 1.0 keeps all
    assert(!byStratum.contains("grp1"))             // fraction 0.0 drops all
    assert(byStratum.keySet.subsetOf(Set("grp0", "grp2"))) // others unlisted
    val grp2Total = rows.count(_._2 == "grp2").toDouble
    assert(math.abs(byStratum("grp2") / grp2Total - 0.5) < 0.2)
    // deterministic across layouts
    val again = Sampling.stratifiedHashSample(df.repartition(8), "g", "id",
      Map("grp0" -> 1.0, "grp1" -> 0.0, "grp2" -> 0.5), "s")
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("bottomK: fixed size, prefix-stable in k, layout-independent") {
    val df = rows.toDF("id", "g")
    val s10 = Sampling.bottomK(df, "id", 10, "s").select("id")
      .as[Long].collect().toSeq
    val s20 = Sampling.bottomK(df, "id", 20, "s").select("id")
      .as[Long].collect().toSeq
    assert(s10.size == 10 && s20.size == 20)
    assert(s20.take(10) == s10, "k=10 sample is not a prefix of k=20")
    val s10b = Sampling.bottomK(df.repartition(8), "id", 10, "s")
      .select("id").as[Long].collect().toSeq
    assert(s10b == s10, "sample changed with partitioning")
  }

  test("weightedSample favors heavy keys, deterministically") {
    // 10% of keys carry weight 4, the rest weight 1
    val df = rows.toDF("id", "g")
      .withColumn("w", when(col("id") <= 200, 4).otherwise(1))
    val k = 200
    val sel = Sampling.weightedSample(df, "id", "w", k, maxWeight = 4, salt = "ws")
      .select("id").as[Long].collect().toSeq
    assert(sel.size == k)
    // heavy keys are 200/2000 of rows but 800/2600 of total weight —
    // their sample share must sit far above 10% (and below certainty)
    val heavy = sel.count(_ <= 200)
    assert(heavy > k / 5 && heavy < k / 2, s"heavy-key share off: $heavy/$k")
    val again = Sampling.weightedSample(df.repartition(8), "id", "w", k, 4, "ws")
      .select("id").as[Long].collect().toSeq
    assert(again == sel, "weighted sample changed with partitioning")
  }

  test("groupSplit rejects malformed cuts") {
    val df = rows.toDF("id", "g")
    assertThrows[IllegalArgumentException] {
      Sampling.groupSplit(df, "g", Seq(0.9, 0.5))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.groupSplit(df, "g", Seq(0.5, 1.0))
    }
  }

  test("bottomKPerGroup: exactly k per big group, all rows of small ones") {
    val df = rows.toDF("id", "g") // groups grp0..grp36, ~54 rows each
      .union(Seq((9001L, "tiny"), (9002L, "tiny")).toDF("id", "g"))
    val got = Sampling.bottomKPerGroup(df, "g", "id", k = 7, salt = "p1")
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert((0 to 36).forall(i => got(s"grp$i") == 7L))
    assert(got("tiny") == 2L)
  }

  test("bottomKPerGroup is partition-independent and prefix-stable in k") {
    val df = rows.toDF("id", "g")
    val k5 = Sampling.bottomKPerGroup(df, "g", "id", 5, "p2")
      .select("id").as[Long].collect().toSet
    val k9 = Sampling.bottomKPerGroup(df.repartition(13), "g", "id", 9, "p2")
      .select("id").as[Long].collect().toSet
    assert(k5.subsetOf(k9), "k=5 sample is not a prefix of k=9")
    val again = Sampling.bottomKPerGroup(df.coalesce(1), "g", "id", 5, "p2")
      .select("id").as[Long].collect().toSet
    assert(again == k5, "sample changed with partitioning")
  }

  test("groupCappedSample: exact cap per big group, small groups whole, layout-independent") {
    val df = rows.toDF("id", "g") // groups grp0..grp36, ~54 rows each
      .union(Seq((9001L, "tiny"), (9002L, "tiny")).toDF("id", "g"))
    val got = Sampling.groupCappedSample(df, "g", "id", cap = 7, salt = "c1")
    val sizes = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert((0 to 36).forall(i => sizes(s"grp$i") == 7L), s"bad cap: $sizes")
    assert(sizes("tiny") == 2L)
    val ids = got.select("id").as[Long].collect().toSet
    val again = Sampling.groupCappedSample(df.repartition(13), "g", "id", 7, "c1")
      .select("id").as[Long].collect().toSet
    assert(again == ids, "sample changed with partitioning")
  }

  test("groupCappedSample pre-filter keeps the rank window bounded") {
    // one hot group 40× over the cap: the survivors entering the rank
    // window must be ~oversample·cap, never the whole group — the
    // scale contract that distinguishes this from bottomKPerGroup
    val hot = (1L to 4000L).map(i => (i, "hot")).toDF("id", "g")
    val cap = 100
    val u = conv(substring(md5(concat(col("id").cast("string"), lit("c2"))), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0)
    val survivors = hot.withColumn("__u", u)
      .where(col("__u") < lit(4.0) * lit(cap.toDouble) / lit(4000.0))
      .count()
    assert(survivors < 16L * cap, s"pre-filter let $survivors rows through")
    assert(survivors >= cap, s"pre-filter undershot: $survivors < $cap")
    val out = Sampling.groupCappedSample(hot, "g", "id", cap, "c2")
    assert(out.count() == cap.toLong)
  }

  test("temperatureMix tempers skew: big sources cut, small kept whole") {
    // A:1000, B:100, C:10 docs, target 300. sqrt shares 31.62/10/3.16
    // (W≈44.79) → rates ≈ 0.2118 / 0.6697 / 1.0 (C caps)
    val docs = ((0L until 1000L).map(i => (i, "A")) ++
      (1000L until 1100L).map(i => (i, "B")) ++
      (1100L until 1110L).map(i => (i, "C"))).toDF("id", "src")
    val kept = Sampling.temperatureMix(docs, "src", "id", 300, "t")
      .as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // C's rate caps at 1.0 → every C row survives
    assert(bySrc.getOrElse("C", 0) == 10)
    // big-source counts land near n·rate (hash uniformity, ±35% slack)
    assert(math.abs(bySrc("A") - 212) < 75, s"A kept ${bySrc("A")}")
    assert(math.abs(bySrc("B") - 67) < 25, s"B kept ${bySrc("B")}")
    // the mix is now FLATTER than the input: A/B ratio drops from 10x
    assert(bySrc("A").toDouble / bySrc("B") < 5.0)
    // deterministic across layouts
    val again = Sampling.temperatureMix(docs.repartition(17), "src", "id", 300, "t")
      .as[(Long, String)].collect().toSet
    assert(again == kept.toSet)
    // monotone in the budget: smaller target is a subset of bigger
    val small = Sampling.temperatureMix(docs, "src", "id", 150, "t")
      .select("id").as[Long].collect().toSet
    val big = Sampling.temperatureMix(docs, "src", "id", 450, "t")
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), "budget growth churned the sample")
  }

  // ───────────────────── neymanAllocation ─────────────────────

  test("high-variance strata are oversampled relative to flat ones") {
    // equal sizes; stratum "wild" has 100× the spread of "calm"
    val data = (1L to 1000L).map { i =>
      if (i <= 500) (i, "calm", 100.0 + (i % 5))       // σ ≈ 1.4
      else (i, "wild", 100.0 + (i % 5) * 100.0)        // σ ≈ 141
    }.toDF("id", "s", "v")
    val kept = Sampling.neymanAllocation(data, "s", "id", "v",
        totalBudget = 300, salt = "t")
      .groupBy("s").count().as[(String, Long)].collect().toMap
    // allocation ∝ N·σ → wild should get ~99% of the budget
    assert(kept.getOrElse("wild", 0L) > 10 * kept.getOrElse("calm", 0L))
  }

  test("zero-variance and singleton strata get no budget") {
    val data = ((1L to 100L).map(i => (i, "const", 7.0)) ++
      Seq((200L, "single", 3.0)) ++
      (300L until 400L).map(i => (i, "var", (i % 10).toDouble))).toDF("id", "s", "v")
    val kept = Sampling.neymanAllocation(data, "s", "id", "v",
        totalBudget = 50, salt = "t")
      .select("s").distinct().as[String].collect().toSet
    assert(kept == Set("var"))
  }

  test("the kept set is layout-independent and monotone in the budget") {
    val data = (1L to 1000L).map(i => (i, s"s${i % 3}", (i % 7).toDouble))
      .toDF("id", "s", "v")
    def run(parts: Int, budget: Long) =
      Sampling.neymanAllocation(data.repartition(parts), "s", "id", "v",
        budget, salt = "m").select("id").as[Long].collect().toSet
    assert(run(1, 200) == run(8, 200))
    assert(run(4, 100).subsetOf(run(4, 400)))
  }

  // ───────────────────── systematicSample ─────────────────────

  test("systematic sample keeps exactly the positions ≡ offset mod k") {
    val data = (1L to 103L).map(i => (i * 10, i)).toDF("ts", "id")
    val kept = Sampling.systematicSample(data, Seq("ts", "id"), k = 5,
        offset = 2).select("id").as[Long].collect().sorted.toSeq
    // sorted positions 0..102; keep 2, 7, 12, … → ids 3, 8, 13, …
    assert(kept == (2L until 103L by 5).map(_ + 1))
  }

  test("systematic sample is layout- and partition-count-independent") {
    val data = (1L to 500L).map(i => ((i * 37) % 1000, i)).toDF("ts", "id")
    def run(parts: Int, rangeParts: Int) =
      Sampling.systematicSample(data.repartition(parts), Seq("ts", "id"),
        k = 7, offset = 0, partitions = rangeParts)
        .select("id").as[Long].collect().toSet
    assert(run(1, 4) == run(16, 4))
    assert(run(4, 2) == run(4, 11)) // range-partition count is internal
  }

  test("sequentialPoisson: deterministic, layout-independent, weighted") {
    val data = (1L to 400L).map(i => (i, (i % 20 + 1).toDouble))
      .toDF("id", "w")
    def run(parts: Int) =
      Sampling.sequentialPoisson(data.repartition(parts), "id", "w",
        k = 50, salt = "t").select("id").as[Long].collect().toSet
    val a = run(1)
    assert(a == run(13) && a.size == 50)
    // weighting pulls: heavy rows (w ≥ 11) should out-represent light
    // ones by construction — deterministic given the fixed salt
    val heavy = a.count(id => id % 20 + 1 >= 11)
    assert(heavy > 25, s"heavy=$heavy of 50")
    // k >= survivors returns everything with positive weight
    val all = Sampling.sequentialPoisson(data, "id", "w", k = 500)
    assert(all.count() == 400)
  }
}
