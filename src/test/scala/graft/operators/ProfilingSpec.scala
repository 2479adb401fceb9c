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
}
