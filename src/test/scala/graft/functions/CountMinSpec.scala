package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch aggregate: exact mergeability, overestimate-only
  * error, and the collision-free-domain exactness the gated query pins. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimates are invariant to partitioning (exact merge)") {
    val rows = (1 to 5000).map(i => s"item${i % 97}")
    val probes = Seq("item0", "item13", "item96")
    def run(parts: Int): Seq[(String, Long)] =
      rows.toDF("x").repartition(parts)
        .agg(CountMin.estimates(col("x"), probes, 256, 4).as("e"))
        .select(explode(col("e")).as("s"))
        .select(col("s.item"), col("s.est")).as[(String, Long)]
        .collect().toSeq
    assert(run(1) == run(8)) // counter arrays sum — merge is exact
  }

  test("estimates never undercount; small collision-free domains are exact") {
    // the gated query's precondition: the events fixture's 5-type domain
    // must be collision-free in a 1024-wide sketch → estimates EXACT
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val domain = events.select("event_type").distinct()
      .as[String].collect().sorted.toSeq
    val exact = events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val ests = events
      .agg(CountMin.estimates(col("event_type"), domain, 1024, 4).as("e"))
      .select(explode(col("e")).as("s"))
      .select(col("s.item"), col("s.est")).as[(String, Long)]
      .collect().toMap
    assert(ests == exact, s"collision in the 1024-wide sketch: $ests vs $exact")

    // adversarial width: 997 distinct items into 64 slots — estimates
    // must still never undercount, and stay within the eps*n band
    val rows = (1 to 20000).map(i => s"k${i % 997}")
    val trueCounts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val probes = Seq("k0", "k1", "k500", "k996")
    val est = rows.toDF("x")
      .agg(CountMin.estimates(col("x"), probes, 64, 4).as("e"))
      .select(explode(col("e")).as("s"))
      .select(col("s.item"), col("s.est")).as[(String, Long)]
      .collect().toMap
    val n = rows.size
    probes.foreach { p =>
      assert(est(p) >= trueCounts(p), s"$p undercounted: ${est(p)} < ${trueCounts(p)}")
      assert(est(p) <= trueCounts(p) + (math.E * n / 64).toLong,
        s"$p above the eps*n band: ${est(p)} vs true ${trueCounts(p)}")
    }
  }

  test("absent probe items estimate to 0 when their slots are untouched") {
    val est = Seq("a", "b", "a").toDF("x")
      .agg(CountMin.estimates(col("x"), Seq("zzz-never-seen", "a"), 1024, 4).as("e"))
      .select(explode(col("e")).as("s"))
      .select(col("s.item"), col("s.est")).as[(String, Long)]
      .collect().toMap
    assert(est("a") == 2L)
    assert(est("zzz-never-seen") == 0L)
  }
}
