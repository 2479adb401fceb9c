package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Profiling

/** TopKAgg — the bounded-heap grouped top-k aggregate. The many-partition
  * inputs force the full TypedImperativeAggregate lifecycle: per-partition
  * partial heaps, serialize → shuffle → deserialize, merge, final eval. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(0, 10000)
    .selectExpr("id", "id % 7 AS g",
      "CAST((id * 2654435761) % 100000 AS DOUBLE) / 100 AS v")
    .repartition(13)

  test("agrees with the window formulation across partial merges") {
    val viaAgg = Profiling.topKPerGroup(data, Seq("g"), col("v"), col("id"),
        struct(col("id"), col("v")), k = 5)
      .select(col("g"), col("rank"), col("item.id"), col("item.v"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val viaWindow = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).cast("int"), col("id"), col("v"))
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaAgg == viaWindow)
  }

  test("ties on ord break deterministically by the tie column") {
    val tied = spark.range(0, 1000)
      .selectExpr("id", "0 AS g", "1.0 AS v").repartition(9)
    val out = Profiling.topKPerGroup(tied, Seq("g"), col("v"), col("id"),
        col("id"), k = 4)
      .select(col("rank"), col("item")).as[(Int, Long)].collect()
      .sortBy(_._1).toSeq
    // all ords equal → largest tie values win, descending
    assert(out == Seq((0, 999L), (1, 998L), (2, 997L), (3, 996L)))
  }

  test("k larger than the group returns the whole group; null ords skipped") {
    val df = Seq((1L, "a", Some(2.0)), (2L, "a", Some(1.0)), (3L, "a", None))
      .toDF("id", "g", "v")
    val out = Profiling.topKPerGroup(df, Seq("g"), col("v"), col("id"),
        col("id"), k = 10)
      .select(col("rank"), col("item")).as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, 1L), (1, 2L))) // null-ord row 3 ignored
  }

  test("plan has partial object-hash aggregation and no Window/Sort of the group") {
    val df = Profiling.topKPerGroup(data, Seq("g"), col("v"), col("id"),
      struct(col("id")), k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k") || plan.contains("partial top_k"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
