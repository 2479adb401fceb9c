package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/plan probes against the fixture tables.
  * Not part of the driver contract; edit freely. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.show(3, truncate = false)
    spark.stop()
  }
}
