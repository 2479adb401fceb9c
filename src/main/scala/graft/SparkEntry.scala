package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets one entry in [[queries]]
  * (a `(SparkSession, sfDir) => DataFrame`) and, when SQL-expressible, a
  * matching DuckDB oracle in [[oracleSql]]. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Mirrors the reference's core shape (filter → derived cyclical feature →
    * groupBy + avg; cf. `/root/reference/src/main/dataset_utils.py:93-102` and
    * `helper_methods.py:159`) over the lineitem fixture: per return-flag mean
    * "delay" (discounted price) with a cyclical month encoding of ship date.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
    li.filter(col("l_quantity").isNotNull && col("l_discount") >= 0)
      .withColumn("ship_month", month(col("l_shipdate")))
      .withColumn("month_sin", sin(lit(2 * math.Pi) * col("ship_month") / lit(12)))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("avg_revenue"),
        avg(col("month_sin")).as("avg_month_sin"))
      .orderBy(col("l_returnflag"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: group-by + mean (hash agg) — helper_methods.py:159
    "q_a1_group_mean" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_a1_group_mean" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
