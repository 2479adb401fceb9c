package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the driver's `SparkEntry.entry` rows>0 check. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // stages whose generated method exceeds the JVM's 8 KB JIT
      // bytecode cap must FALL BACK (non-WSCG) instead of running
      // interpreted forever; Spark's default guard (65536) sits far
      // above the real HotSpot limit (DontCompileHugeMethods)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"[entry-smoke] rows=${df.count()}")
    spark.stop()
  }
}
