package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rendezvous routing ([[Sharding.rendezvousAssign]]): stability,
  * balance, and the minimal-movement property. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (1L to 3000L).toDF("k")
  private val five = (0 until 5).map(i => s"s$i")

  test("assignment is deterministic and roughly balanced") {
    val counts = keys
      .select(Sharding.rendezvousAssign(col("k"), five).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == five.toSet)
    // 3000 keys over 5 shards: each within ±25% of 600
    assert(counts.values.forall(n => n > 450 && n < 750), counts)
    val again = keys
      .select(Sharding.rendezvousAssign(col("k"), five).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts == again)
  }

  test("growing the shard set only moves keys INTO the new shard") {
    val both = keys.select(
      Sharding.rendezvousAssign(col("k"), five).as("a"),
      Sharding.rendezvousAssign(col("k"), five :+ "s5").as("b"))
    val moved = both.where(col("a") =!= col("b"))
      .select("b").distinct().as[String].collect().toSeq
    assert(moved == Seq("s5"), "a key moved between surviving shards")
    // and roughly 1/6 of keys moved
    val nMoved = both.where(col("a") =!= col("b")).count()
    assert(nMoved > 300 && nMoved < 700, s"moved $nMoved of 3000")
  }

  test("shard order in the argument list does not matter") {
    val a = keys.select(Sharding.rendezvousAssign(col("k"), five).as("s"))
      .as[String].collect().toSeq
    val b = keys.select(Sharding.rendezvousAssign(col("k"), five.reverse).as("s"))
      .as[String].collect().toSeq
    assert(a == b)
  }
}
