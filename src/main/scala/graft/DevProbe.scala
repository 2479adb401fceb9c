package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: repeated-run timing probe for bench stability. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q_x_langid", "q_x_langid", "q_x_langid")) {
      val times = (1 to 3).map { _ =>
        time(q) {
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"[probe] $q%-22s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
