package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Single-pass EDA profiling semantics (SURVEY §2.4 / §4.3 rewrites). */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1), Some(10), "a"), (Some(2), Some(20), "b"), (Some(3), None, "a"),
    (Some(4), Some(40), "c"), (None, Some(50), "b")
  ).toDF("x", "y", "g")

  test("distinctCounts / nullCounts batch all columns into one row") {
    val d = Profiling.distinctCounts(df, Seq("x", "y", "g")).first()
    assert((d.getLong(0), d.getLong(1), d.getLong(2)) == (4L, 4L, 3L))
    val n = Profiling.nullCounts(df, Seq("x", "y")).first()
    assert((n.getLong(0), n.getLong(1)) == (1L, 1L))
  }

  test("numericColumns picks integer columns above the distinct threshold") {
    val wide = (1 to 100).map(i => (i, i % 3, s"s$i")).toDF("many", "few", "s")
    assert(Profiling.numericColumns(wide, threshold = 30) == Seq("many"))
  }

  test("groupMean + meanSpreadRatio reproduce the reference gate") {
    val gm = Profiling.groupMean(df.na.drop(), "g", "y")
    val byG = gm.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // na.drop removes (3,null,a) and (null,50,b) → b keeps only y=20
    assert(byG("a") == 10.0 && byG("b") == 20.0 && byG("c") == 40.0)
    assert(math.abs(Profiling.meanSpreadRatio(gm) - 4.0) < 1e-9)
  }

  test("crosstab pivots counts with zero fill") {
    val ct = Profiling.crosstab(df, "g", "g")
    val a = ct.filter(col("g") === "a").first()
    assert(a.getAs[Long]("a") == 2L && a.getAs[Long]("c") == 0L)
  }

  test("regressionMetrics: mae/rmse of a known prediction set") {
    val preds = Seq((0.0, 3.0), (0.0, -4.0)).toDF("ArrDelay", "prediction")
    val m = Profiling.regressionMetrics(preds).first()
    assert(math.abs(m.getDouble(0) - 3.5) < 1e-9)
    assert(math.abs(m.getDouble(1) - math.sqrt(12.5)) < 1e-9)
  }

  test("dataDistribution: nulls, corr, and quantiles per column in two jobs") {
    val data = (1 to 100).map(i => (i, i * 2)).toDF("a", "ArrDelay")
    val out = Profiling.dataDistribution(data, Seq("a"), "ArrDelay").first()
    assert(out.getAs[Long]("nulls") == 0L)
    assert(math.abs(out.getAs[Double]("corr") - 1.0) < 1e-9)
    assert(out.getAs[Double]("quantile_50") > 40 && out.getAs[Double]("quantile_50") < 60)
  }

  test("dataDistribution survives empty input and all-null columns") {
    val empty = Seq.empty[(Option[Int], Option[Int])].toDF("a", "ArrDelay")
    val e = Profiling.dataDistribution(empty, Seq("a"), "ArrDelay").first()
    assert(e.getAs[Long]("nulls") == 0L && e.getAs[Double]("corr").isNaN)
    assert(e.getAs[Double]("quantile_50").isNaN)

    val allNull = Seq((Option.empty[Int], Some(1)), (Option.empty[Int], Some(2)))
      .toDF("a", "ArrDelay")
    val n = Profiling.dataDistribution(allNull, Seq("a"), "ArrDelay").first()
    assert(n.getAs[Long]("nulls") == 2L && n.getAs[Double]("quantile_50").isNaN)
  }

  test("correlationMatrix computes every i<j pair in one pass") {
    val data = (1 to 50).map(i => (i.toDouble, i * 2.0, 51.0 - i)).toDF("a", "b", "c")
    val m = Profiling.correlationMatrix(data, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size == 3)
    assert(math.abs(m(("a", "b")) - 1.0) < 1e-9)
    assert(math.abs(m(("a", "c")) + 1.0) < 1e-9)
    assert(math.abs(m(("b", "c")) + 1.0) < 1e-9)
  }

  test("crosstabNormalized rows sum to 1") {
    val ctn = Profiling.crosstabNormalized(df, "g", "g")
    ctn.collect().foreach { r =>
      val total = (1 until r.length).map(r.getDouble).sum
      assert(math.abs(total - 1.0) < 1e-9)
    }
  }

  test("histogram buckets equal-width counts and clamps out-of-range values") {
    val data = Seq(-5.0, 0.0, 1.0, 9.9, 10.0, 19.9, 25.0).toDF("v")
    val h = Profiling.histogram(data, "v", lo = 0.0, hi = 20.0, bins = 2)
      .orderBy("bucket").collect()
    assert(h.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((0, 4L), (1, 3L)))
    assert(h.head.getAs[Double]("bucket_lo") == 0.0)
    assert(h.head.getAs[Double]("bucket_hi") == 10.0)
  }

  test("robustOutlierStats flags by MAD, keeps zero-MAD groups sane, skips nulls") {
    val data = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(100.0)), ("a", None),
      ("b", Some(10.0)), ("b", Some(10.0)), ("b", Some(10.0)))
      .toDF("g", "v")
    val out = Profiling.robustOutlierStats(data, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // med 3, devs {2,1,0,1,97}, mad 1 → only the 100 exceeds 3·MAD; the
    // contaminating value itself never moved the threshold (50% breakdown)
    assert(a.getAs[Double]("med") == 3.0 && a.getAs[Double]("mad") == 1.0)
    assert(a.getAs[Long]("n") == 5L && a.getAs[Long]("n_outliers") == 1L)
    assert(a.getAs[Double]("outlier_rate") == 0.2)
    // constant group: MAD 0, strict > means nothing flags
    val b = out("b")
    assert(b.getAs[Double]("mad") == 0.0 && b.getAs[Long]("n_outliers") == 0L)
  }

  test("welchTTest reproduces the textbook unequal-variance statistic") {
    val data = (Seq(1, 2, 3, 4, 5).map(v => ("a", Some(v.toDouble))) ++
      Seq(2, 4, 6, 8).map(v => ("b", Some(v.toDouble))) ++
      Seq(("a", None), ("c", Some(99.0)))) // null and off-group rows ignored
      .toDF("g", "v")
    val r = Profiling.welchTTest(data, "g", "v", "a", "b").first()
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 3.0 && r.getAs[Double]("mean_b") == 5.0)
    // scipy.stats.ttest_ind(equal_var=False) on the same samples
    assert(math.abs(r.getAs[Double]("t_stat") - -1.358732441) < 1e-6)
    assert(math.abs(r.getAs[Double]("df") - 4.749414520) < 1e-6)
  }

  test("welchTTest is antisymmetric and zero on identical samples") {
    val data = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val r = Profiling.welchTTest(data, "g", "v", "a", "b").first()
    assert(r.getAs[Double]("t_stat") == 0.0)
  }

  test("chiSquare reproduces the textbook 2x2 statistic") {
    // classic 2x2: [[20,30],[30,20]] → chi2 = 4.0 (without Yates), dof 1,
    // n 100, Cramér's V = sqrt(4/100) = 0.2
    val rows = Seq.fill(20)(("m", "y")) ++ Seq.fill(30)(("m", "n")) ++
      Seq.fill(30)(("f", "y")) ++ Seq.fill(20)(("f", "n"))
    val r = Profiling.chiSquare(rows.toDF("sex", "ans"), "sex", "ans").first()
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("cramers_v") == 0.2)
  }

  test("gini: 0 when even, known value when concentrated, tie-insensitive") {
    val df = (Seq.fill(4)(("even", 5.0)) ++                 // all equal → 0
      Seq(("conc", 0.0), ("conc", 0.0), ("conc", 0.0), ("conc", 4.0)) ++
      Seq(("ties", 1.0), ("ties", 1.0), ("ties", 2.0)))
      .toDF("g", "v")
    val got = Profiling.gini(df, "g", "v")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got("even") == 0.0)
    assert(got("conc") == 0.75) // 2*16/(4*4) - 5/4
    // ties: sorted (1,1,2): sum i*x = 1+2+6 = 9; 2*9/(3*4) - 4/3 = 1/6
    assert(math.abs(got("ties") - 1.0 / 6) < 1e-6)
  }

  test("covarianceMatrix matches driver-side computation; listwise nulls") {
    val rows = Seq(
      (Some(1.0), Some(2.0), Some(0.5)),
      (Some(2.0), Some(4.0), Some(0.25)),
      (Some(3.0), Some(5.0), Some(1.0)),
      (Some(4.0), Some(9.0), Some(0.0)),
      (None, Some(99.0), Some(9.9))) // any-null row drops entirely
    val got = Profiling.covarianceMatrix(rows.toDF("x", "y", "z"),
      Seq("x", "y", "z")).as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val clean = rows.collect { case (Some(x), Some(y), Some(z)) => (x, y, z) }
    def cov(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val s = a.zip(b).map { case (p, q) => p * q }.sum
      math.rint((s - a.sum * b.sum / n) / (n - 1) * 1e6) / 1e6
    }
    val (xs, ys, zs) = (clean.map(_._1), clean.map(_._2), clean.map(_._3))
    assert(got(("x", "x")) == cov(xs, xs)) // diagonal = variance
    assert(got(("x", "y")) == cov(xs, ys))
    assert(got(("y", "z")) == cov(ys, zs))
    assert(got.size == 6) // 3 cols → 6 upper-triangle cells
  }

  test("proportionsZTest reproduces the textbook pooled statistic") {
    val rows: Seq[(String, Option[Boolean])] =
      Seq.tabulate(100)(i => ("a", Some(i < 40))) ++   // a: 40/100
      Seq.tabulate(100)(i => ("b", Some(i < 30))) ++   // b: 30/100
      Seq(("a", None), ("c", Some(true)))  // null success, off-group row
    val r = Profiling.proportionsZTest(rows.toDF("g", "hit"), "g", "hit",
      "a", "b").first()
    assert(r.getAs[Long]("n_a") == 101L) // null success still counts exposure
    assert(r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Double]("rate_b") == 0.3)
    val pa = 40.0 / 101; val pool = 70.0 / 201
    val expect = (pa - 0.3) /
      math.sqrt(pool * (1 - pool) * (1.0 / 101 + 1.0 / 100))
    assert(math.abs(r.getAs[Double]("z_stat") - expect) < 1e-9)
  }

  test("chiSquare is ~zero under exact independence; nulls are dropped") {
    // perfectly proportional table → every o == e → chi2 == 0
    val rows = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y")))
      .map { case (a, b) => (Some(a), Some(b)) } ++
      Seq((None: Option[String], Some("x")), (Some("a"), None: Option[String]))
    val r = Profiling.chiSquare(rows.toDF("a", "b"), "a", "b").first()
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("n") == 90L)
  }

  // ───────────────────── anovaF ─────────────────────

  test("anovaF separates shifted groups and nulls out identical ones") {
    // three groups with the SAME spread, very different means → huge F
    val shifted = (1 to 30).flatMap(i => Seq(
      ("a", 10.0 + i % 3), ("b", 50.0 + i % 3), ("c", 90.0 + i % 3)))
    val r1 = Profiling.anovaF(shifted.toDF("g", "v"), "g", "v").first()
    assert(r1.getAs[Long]("k") == 3L && r1.getAs[Long]("n") == 90L)
    assert(r1.getAs[Double]("f_stat") > 1000.0)
    // identical groups → SSB ~0 → F ~0 (but defined)
    val same = (1 to 30).flatMap(i => Seq(("a", 5.0 + i % 4), ("b", 5.0 + i % 4)))
    val r2 = Profiling.anovaF(same.toDF("g", "v"), "g", "v").first()
    assert(math.abs(r2.getAs[Double]("ss_between")) < 1e-6)
    // a single group or zero within-variance → null F, no NaN
    val one = Profiling.anovaF(Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), "g", "v").first()
    assert(one.isNullAt(one.fieldIndex("f_stat")))
  }

  // ───────────────────── groupOls ─────────────────────

  test("groupOls recovers a planted linear relationship per group") {
    // g: y = 3x + 7 exactly (r² = 1); h: y independent of x (slope ~0);
    // z: zero x-variance → nulls
    val rows =
      (1 to 40).map(i => ("g", i.toDouble, 3.0 * i + 7)) ++
      (1 to 40).map(i => ("h", i.toDouble, (i % 2).toDouble)) ++
      Seq(("z", 5.0, 1.0), ("z", 5.0, 9.0))
    val got = Profiling.groupOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getDouble(2) == 3.0 && got("g").getDouble(3) == 7.0)
    assert(got("g").getDouble(4) == 1.0)
    assert(math.abs(got("h").getDouble(2)) < 0.05)
    assert(got("h").getDouble(4) < 0.05)
    val z = got("z")
    assert(z.isNullAt(2) && z.isNullAt(3) && z.isNullAt(4))
  }

  // ───────────────────── weightedMedian ─────────────────────

  test("weightedMedian finds the weight-crossing value per group") {
    // group g: value 1 carries weight 9, value 100 weight 1 → median 1;
    // group h: symmetric unit weights over 1..4 → lower-half crossing at 2
    val rows = Seq(
      ("g", 1.0, 9.0), ("g", 100.0, 1.0),
      ("h", 1.0, 1.0), ("h", 2.0, 1.0), ("h", 3.0, 1.0), ("h", 4.0, 1.0))
    val got = Profiling.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("g") == ((1.0, 10.0)))
    assert(got("h") == ((2.0, 4.0)))
  }

  test("weightedMedian is invariant to tie order and layout") {
    val rows = (1L to 500L).map(i => (s"s${i % 3}", (i % 7).toDouble, (i % 4 + 1).toDouble))
    def run(parts: Int) =
      Profiling.weightedMedian(rows.toDF("g", "v", "w").repartition(parts),
        "g", "v", "w").orderBy("g").collect().toSeq
    assert(run(1) == run(9))
  }

  // ───────────────────── mutualInfo ─────────────────────

  test("mutualInfo is 0 for independent columns, ln2 for identical ones") {
    import spark.implicits._
    // perfectly independent 2×2: every cell n/4
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    val mi0 = Profiling.mutualInfo(indep.toDF("u", "v"), "u", "v")
      .head().getAs[Double]("mi_nats")
    assert(mi0 == 0.0)
    // identical binary columns: MI = H = ln 2
    val same = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
    val mi1 = Profiling.mutualInfo(same.toDF("u", "v"), "u", "v")
      .head().getAs[Double]("mi_nats")
    assert(math.abs(mi1 - math.log(2)) < 1e-6)
  }

  test("mutualInfo drops null labels and counts cells") {
    import spark.implicits._
    val rows = Seq(("a", "x"), ("a", null), (null, "y"), ("b", "y"))
    val r = Profiling.mutualInfo(rows.toDF("u", "v"), "u", "v").head()
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("n_cells") == 2L)
  }

  // ───────────────────── benfordDigits ─────────────────────

  test("benford extracts leading digits integer-side and sums shares to 1") {
    import spark.implicits._
    val vals = Seq(1.23, 12.34, 199.99, 2.50, 0.91, 923.11, -5.0, 0.0)
    val out = Profiling.benfordDigits(vals.toDF("v"), "v", scale = 2)
      .orderBy("digit").collect()
    // -5.0 and 0.0 excluded; leading digits of cents-scaled ints:
    // 123→1, 1234→1, 19999→1, 250→2, 91→9, 92311→9
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 3L, 2 -> 1L, 9 -> 2L))
    assert(math.abs(out.map(_.getAs[Double]("p_obs")).sum - 1.0) < 1e-5)
    // expected shares are the Benford literals
    val exp = out.map(_.getAs[Double]("p_exp")).toSeq
    val lad = Profiling.benfordExpected
    assert(exp == Seq(lad(0), lad(1), lad(8)))
  }

  test("benford chi2 terms are non-negative and finite") {
    import spark.implicits._
    val vals = (1 to 300).map(i => i * 1.17)
    val out = Profiling.benfordDigits(vals.toDF("v"), "v", scale = 2).collect()
    assert(out.forall { r =>
      val t = r.getAs[Double]("chi2_term"); t >= 0 && !t.isNaN && !t.isInfinite
    })
  }

  test("categoricalEntropy: 0 for constant, ln k for uniform mixes") {
    import spark.implicits._
    val df = (Seq.fill(4)(("mono", "a")) ++
      Seq(("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d")))
      .toDF("g", "c")
    val got = Profiling.categoricalEntropy(df, "g", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("entropy"))).toMap
    assert(got("mono") == (4L, 1L, 0.0))
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("uni") == (4L, 4L, ln4))
  }

  test("groupOls2 recovers exact planted coefficients") {
    import spark.implicits._
    // y = 3 + 2·x1 − 5·x2 exactly, on a non-collinear grid
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 4)
      yield ("g", x1.toDouble, x2.toDouble, 3.0 + 2.0 * x1 - 5.0 * x2)
    val r = Profiling.groupOls2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").head()
    assert(r.getAs[Double]("b0") == 3.0)
    assert(r.getAs[Double]("b1") == 2.0)
    assert(r.getAs[Double]("b2") == -5.0)
    // collinear regressors → singular Gram → nulls
    val col2 = (1 to 10).map(i => ("g", i.toDouble, 2.0 * i, i * 1.5))
    val c = Profiling.groupOls2(col2.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").head()
    assert(c.isNullAt(c.fieldIndex("b1")))
  }

  test("joinCardinalityEstimate: exact at fraction 1, unbiased-ish sampled") {
    import spark.implicits._
    val a = (1L to 100L).map(k => (k, "x")).toDF("k", "pad")
    // b: key k appears (k % 3 + 1) times
    val b = (1L to 100L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
      .toDF("k")
    val actual = a.join(b, "k").count()
    val full = Profiling.joinCardinalityEstimate(a, "k", b, "k", 1.0)
      .head().getDouble(0)
    assert(full == actual.toDouble)
    val est = Profiling.joinCardinalityEstimate(a, "k", b, "k", 0.25, "s1")
      .head().getDouble(0)
    assert(est > 0 && math.abs(est - actual) / actual < 0.6)
  }

  test("mannWhitneyU: hand-checked U and z with ties") {
    import spark.implicits._
    // A = (1, 2, 2), B = (3, 3, 4): every A < every B → U1 = 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0),
      ("b", 3.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = Profiling.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Double]("u1") == 0.0)
    // σ² = (9/12)·(7 − 12/30) = 4.95; z = (0 − 4.5)/sqrt(4.95)
    val expZ = BigDecimal(-4.5 / math.sqrt(4.95))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == expZ)
    // all-tied input degenerates to null z
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val t = Profiling.mannWhitneyU(tied, "g", "v", "a", "b").head()
    assert(t.isNullAt(t.fieldIndex("z")))
  }

  test("ksTest: exact D on hand-built samples, 1.0 on disjoint ones") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6} → max CDF gap 0.5 (at value 2)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = Profiling.ksTest(df, "g", "v", "a", "b").head()
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Double]("ks_d") == 0.5)
    val disj = (Seq(1.0, 2.0).map(("a", _)) ++ Seq(9.0).map(("b", _)))
      .toDF("g", "v")
    assert(Profiling.ksTest(disj, "g", "v", "a", "b")
      .head().getAs[Double]("ks_d") == 1.0)
  }

  test("modeByGroup picks the most frequent value, smallest on ties") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 1.0),
      ("b", 5.0), ("b", 3.0)).toDF("g", "v") // b: tie 3 vs 5 → 3
    val got = Profiling.modeByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> (2.0, 2L), "b" -> (3.0, 1L)))
  }

  test("theilSen shrugs off the outlier that wrecks OLS") {
    import spark.implicits._
    // y = 2x exactly, except one wild outlier at x=6
    val rows = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 4.0, 8.0), (5L, 5.0, 10.0), (6L, 6.0, 500.0))
      .map { case (id, x, y) => ("g", id, x, y) }
    val df = rows.toDF("g", "id", "x", "y")
    val ts = Profiling.theilSen(df, "g", "x", "y", "id").head()
    assert(ts.getAs[Long]("n_pairs") == 15L)
    assert(ts.getAs[Double]("slope_med") == 2.0)
    val ols = Profiling.groupOls(df, "g", "x", "y").head()
    assert(ols.getAs[Double]("slope") > 30.0) // OLS dragged far off
  }

  test("theilSen lower median is deterministic for even pair counts") {
    import spark.implicits._
    // 3 points → 3 pairs... use 4 x-distinct points → 6 pairs (even)
    val df = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 3.0),
      ("g", 3L, 3.0, 4.0), ("g", 4L, 4.0, 8.0)).toDF("g", "id", "x", "y")
    // slopes: (1,2)=2 (1,3)=1.5 (1,4)≈2.3333 (2,3)=1 (2,4)=2.5 (3,4)=4
    // sorted: 1, 1.5, 2, 2.333…, 2.5, 4 → lower median (pos 3) = 2
    val ts = Profiling.theilSen(df, "g", "x", "y", "id").head()
    assert(ts.getAs[Long]("n_pairs") == 6L)
    assert(ts.getAs[Double]("slope_med") == 2.0)
  }

  test("missingPatterns counts rows per null-mask combination") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)](
      (Double.box(1.0), "a"), (Double.box(2.0), null),
      (null, "c"), (null, null), (Double.box(5.0), "e"))
      .toDF("x", "y")
    val got = Profiling.missingPatterns(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("11" -> 2L, "10" -> 1L, "01" -> 1L, "00" -> 1L))
  }

  test("spearman: ±1 on monotone transforms, tie-averaged in between") {
    import spark.implicits._
    // any strictly monotone transform → exactly 1 (rank-identical)
    val mono = (1 to 40).map(i => (i.toDouble, math.exp(i / 7.0)))
    val up = Profiling.spearman(mono.toDF("a", "b"), "a", "b").head()
    assert(up.getAs[Long]("n") == 40L)
    assert(math.abs(up.getAs[Double]("rho") - 1.0) < 1e-9)
    val anti = Profiling.spearman(
      mono.map { case (a, b) => (a, -b) }.toDF("a", "b"), "a", "b").head()
    assert(math.abs(anti.getAs[Double]("rho") + 1.0) < 1e-9)
    // tie-averaged ranks: hand-checked textbook value — a = (1,2,3,4),
    // b = (10,10,20,30): rho = 0.9486833 (fractional ranks 1.5,1.5,3,4)
    val tied = Seq((1.0, 10.0), (2.0, 10.0), (3.0, 20.0), (4.0, 30.0))
    val got = Profiling.spearman(tied.toDF("a", "b"), "a", "b").head()
    assert(math.abs(got.getAs[Double]("rho") - 0.948683) < 1e-6)
    // layout independence: repartitioned input gives the identical rho
    val re = Profiling.spearman(tied.toDF("a", "b").repartition(5), "a", "b")
      .head()
    assert(re.getAs[Double]("rho") == got.getAs[Double]("rho"))
  }

  test("rocAuc: perfect, reversed, and tie-averaged hand case") {
    import spark.implicits._
    val perfect = Seq((true, 4.0), (true, 3.0), (false, 2.0), (false, 1.0))
      .toDF("y", "v")
    assert(Profiling.rocAuc(perfect, "y", "v").head()
      .getAs[Double]("auc") == 1.0)
    val reversed = Seq((false, 4.0), (false, 3.0), (true, 2.0), (true, 1.0))
      .toDF("y", "v")
    assert(Profiling.rocAuc(reversed, "y", "v").head()
      .getAs[Double]("auc") == 0.0)
    // pos {3, 2}, neg {2, 1}: wins 3, tie 0.5 → AUC = 3.5/4 = 0.875
    val tied = Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0))
      .toDF("y", "v")
    val r = Profiling.rocAuc(tied, "y", "v").head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("auc") == 0.875)
    assert(r.getAs[Double]("gini") == 0.75)
    // layout independence
    val re = Profiling.rocAuc(tied.repartition(5), "y", "v").head()
    assert(re.getAs[Double]("auc") == 0.875)
    // single-class input: AUC/gini null, counts still reported
    val mono = Seq((true, 1.0), (true, 2.0)).toDF("y", "v")
    val m = Profiling.rocAuc(mono, "y", "v").head()
    assert(m.getAs[Long]("n_pos") == 2L && m.getAs[Long]("n_neg") == 0L)
    assert(m.isNullAt(m.fieldIndex("auc")) && m.isNullAt(m.fieldIndex("gini")))
  }

  test("brierDecomposition: hand case satisfies Murphy identity") {
    import spark.implicits._
    val df = Seq((0.8, true), (0.8, false), (0.2, false), (0.2, false))
      .toDF("p", "y")
    val r = Profiling.brierDecomposition(df, "p", "y").head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Double]("brier") == 0.19)
    assert(r.getAs[Double]("uncertainty") == 0.1875)
    assert(r.getAs[Double]("reliability") == 0.065)
    assert(r.getAs[Double]("resolution") == 0.0625)
    // brier = rel − res + unc
    assert(math.abs(0.065 - 0.0625 + 0.1875 - 0.19) < 1e-12)
  }

  test("conformalCoverage: exact order-statistic radius and coverage") {
    import spark.implicits._
    // calibration residuals |v−13| = [3,1,1,3]; α=0.5 → k=⌈5·0.5⌉=3
    // → q̂ = 3rd smallest = 3; test residuals [1,4] → coverage 1/2
    val df = Seq((true, "a", 10.0), (true, "a", 12.0), (true, "a", 14.0),
      (true, "a", 16.0), (false, "a", 12.0), (false, "a", 17.0))
      .toDF("cal", "g", "v")
    val r = Profiling.conformalCoverage(df, "cal", "g", "v", alpha = 0.5)
      .head()
    assert(r.getAs[Long]("n_cal") == 4L && r.getAs[Long]("n_test") == 2L)
    assert(r.getAs[Long]("k_rank") == 3L)
    assert(r.getAs[Double]("qhat") == 3.0)
    assert(r.getAs[Double]("coverage") == 0.5)
  }
}
