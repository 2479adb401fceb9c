package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Bucketing

/** As-of join semantics, salted-join equivalence, bucketed co-located join
  * plan shape. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward join picks the latest right row at or before left time") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"), (2L, 100L, "d")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 100L, 10.0), (1L, 150L, 20.0), (3L, 10L, 99.0)
    ).toDF("k", "rt", "rv")

    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "lv", "asof_rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    assert(out == Set(
      (1L, 100L, "a", Some(10.0)),  // equal timestamp matches (<=)
      (1L, 200L, "b", Some(20.0)),  // latest of 100/150
      (1L, 50L, "c", None),         // nothing at or before 50
      (2L, 100L, "d", None)))       // key with no right rows
  }

  test("asof forward join picks the earliest right row at or after left time") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"), (2L, 100L, "d")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 100L, 10.0), (1L, 150L, 20.0), (3L, 10L, 99.0)
    ).toDF("k", "rt", "rv")

    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "lv", "asof_rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    assert(out == Set(
      (1L, 100L, "a", Some(10.0)),  // equal timestamp matches (>=)
      (1L, 200L, "b", None),        // nothing at or after 200
      (1L, 50L, "c", Some(10.0)),   // earliest of 100/150
      (2L, 100L, "d", None)))       // key with no right rows

    val far = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(10L))
      .filter(col("t") === 50L).select("asof_rv").first()
    assert(far.isNullAt(0)) // 100 is 50 away > tolerance 10
  }

  test("asof tolerance nulls out matches that are too far back") {
    val left = Seq((1L, 1000L, "x")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 5.0)).toDF("k", "rt", "rv")
    val near = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(2000L)).select("asof_rv").first()
    val far = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(100L)).select("asof_rv").first()
    assert(near.getDouble(0) == 5.0)
    assert(far.isNullAt(0))
  }

  test("salted join equals the plain join result on skewed keys") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) i else 1, i))
      .toDF("key", "payload") // 90% of rows share key=1
    val dim = Seq((1, "hot"), (10, "ten"), (20, "twenty")).toDF("key", "name")

    val plain = skewed.join(dim, "key")
      .select("key", "payload", "name").collect().toSet
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "key", salts = 8)
      .select("key", "payload", "name").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables join without an exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "bv")
    Bucketing.writeBucketed(a, "bkt_a", Seq("id"), 4)
    Bucketing.writeBucketed(b, "bkt_b", Seq("id"), 4)
    // force the sort-merge path: at fixture size Catalyst would broadcast
    // (which sidesteps bucketing); at 100 TB neither side is broadcastable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cocatedJoin(spark, "bkt_a", "bkt_b", Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bandJoin equals the naive between-join on overlapping float ranges") {
    val points = (0 to 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val ranges = Seq((1L, 10.0, 39.9), (2L, 30.0, 59.9), (3L, 120.0, 121.0),
      (4L, -5.0, 4.9)).toDF("rid", "lo", "hi")
    val naive = points.join(ranges,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").collect().toSet
    val banded = RangeJoin.bandJoin(points, "v", ranges, "lo", "hi", 25L)
      .select("pid", "rid").collect().toSet
    assert(banded == naive && naive.nonEmpty)
  }

  test("bandJoin handles negative integral domains (trunc-div quantizer)") {
    val points = (-50L to 50L).map(i => (i, i)).toDF("pid", "v")
    val ranges = Seq((1L, -45L, -12L), (2L, -5L, 5L), (3L, 40L, 60L))
      .toDF("rid", "lo", "hi")
    val naive = points.join(ranges,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").collect().toSet
    val banded = RangeJoin.bandJoin(points, "v", ranges, "lo", "hi", 7L)
      .select("pid", "rid").collect().toSet
    assert(banded == naive && naive.nonEmpty)
  }

  test("bandJoin rejects mixed integral/floating join columns") {
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val ranges = Seq((1L, 0.0, 10.0)).toDF("rid", "lo", "hi")
    assertThrows[IllegalArgumentException] {
      RangeJoin.bandJoin(points, "v", ranges, "lo", "hi", 5L)
    }
  }
}
