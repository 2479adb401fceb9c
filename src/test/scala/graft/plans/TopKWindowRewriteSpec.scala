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

  test("does not fire on shapes it cannot prove equivalent") {
    // ascending PRIMARY order
    val wAsc = Window.partitionBy("g").orderBy(col("v").asc)
    val asc = data.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 3)
    assert(planOf(asc).contains("Window"))
    // long primary (double embedding would lose precision)
    val wLong = Window.partitionBy("g").orderBy(col("id").desc)
    val lng = data.withColumn("rn", row_number().over(wLong)).filter(col("rn") <= 3)
    assert(planOf(lng).contains("Window"))
    // rank() instead of row_number()
    val wRank = Window.partitionBy("g").orderBy(col("v").desc)
    val rnk = data.withColumn("rn", rank().over(wRank)).filter(col("rn") <= 3)
    assert(planOf(rnk).contains("Window"))
  }

  test("extensions inject the rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    assert(org.apache.spark.sql.graftbridge.ColumnBridge
      .optimizerRules(ext, spark).contains(TopKWindowRewrite))
  }
}
