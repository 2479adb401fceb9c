package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: explain-plan audit for key queries. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.01"
    for (q <- Seq("q_p5_filter_conj", "q_j1_dim_join", "q_j1_fact_join",
        "q_a1_group_mean", "q_w2_global_max_share", "q_x_cosine_topk")) {
      println(s"\n########## $q ##########")
      println(SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
