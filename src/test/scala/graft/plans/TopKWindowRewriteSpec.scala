package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.SparkSpec

/** TopKWindowRewrite — the optimizer rule turning the row_number()<=k
  * window idiom into the bounded-heap TopKAgg aggregate. The rule is
  * applied to the optimized plan (where the Filter sits directly on the
  * Window after predicate pushdown) and the rewritten plan is executed
  * for row-for-row comparison with the window original. */
class TopKWindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(0, 5000)
    .selectExpr("id", "id % 5 AS g",
      "CAST((id * 37) % 1000 AS DOUBLE) AS v",
      "CASE WHEN id % 97 = 0 THEN NULL ELSE CAST(id % 31 AS DOUBLE) END AS nv")
    .repartition(7)

  private def applyRule(df: DataFrame): (Boolean, DataFrame) = {
    val optimized = df.queryExecution.optimizedPlan
    val rewritten = TopKWindowRewrite(optimized)
    (rewritten ne optimized, ColumnBridge.ofRows(spark, rewritten))
  }

  test("rewrites filter-over-row_number into TopKAgg with identical rows") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val df = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
    val (fired, rewritten) = applyRule(df)
    assert(fired, "rule did not fire")
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("top_k") && !plan.contains("Window"), plan)
    val a = df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = rewritten.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("null primaries rank last, exactly like DESC NULLS LAST") {
    // k large enough that null-ord rows make the cut in small groups
    val w = Window.partitionBy("g").orderBy(col("nv").desc, col("id").desc)
    val df = data.filter(col("id") < 300)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 70)
    val (fired, rewritten) = applyRule(df)
    assert(fired)
    val a = df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = rewritten.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("does not fire on shapes it cannot prove equivalent") {
    // ascending order
    val wAsc = Window.partitionBy("g").orderBy(col("v").asc)
    val asc = data.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 3)
    assert(!applyRule(asc)._1)
    // long primary (double embedding would lose precision)
    val wLong = Window.partitionBy("g").orderBy(col("id").desc)
    val lng = data.withColumn("rn", row_number().over(wLong)).filter(col("rn") <= 3)
    assert(!applyRule(lng)._1)
    // rank() instead of row_number()
    val wRank = Window.partitionBy("g").orderBy(col("v").desc)
    val rnk = data.withColumn("rn", rank().over(wRank)).filter(col("rn") <= 3)
    assert(!applyRule(rnk)._1)
  }

  test("extensions inject the rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    assert(ColumnBridge.optimizerRules(ext, spark).contains(TopKWindowRewrite))
  }
}
