package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 10.0), ("a", 20.5), ("a", -3.0),
    ("b", 7.25), ("b", 7.25),
    ("c", 100.0)).toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    Incremental.finish(df).orderBy(col("k"))
      .collect().map(_.toSeq).toSeq

  test("state from any batch split merges to the direct aggregate") {
    val direct = Incremental.aggState(rows, Seq("k"), "v")
    val b1 = Incremental.aggState(rows.filter(col("v") > 7.5), Seq("k"), "v")
    val b2 = Incremental.aggState(rows.filter(col("v") <= 7.5), Seq("k"), "v")
    assert(canon(Incremental.merge(b1, b2, Seq("k"))) == canon(direct))
    // merge order must not matter (commutative)
    assert(canon(Incremental.merge(b2, b1, Seq("k"))) == canon(direct))
  }

  test("merge handles keys present on only one side") {
    val left = Incremental.aggState(rows.filter(col("k") === "a"), Seq("k"), "v")
    val right = Incremental.aggState(rows.filter(col("k") =!= "a"), Seq("k"), "v")
    val merged = Incremental.finish(Incremental.merge(left, right, Seq("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("finish derives avg from the partials without re-reading data") {
    val st = Incremental.finish(Incremental.aggState(rows, Seq("k"), "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(5))).toMap
    assert(st("a") == ((3L, math.rint(27.5 / 3 * 1e6) / 1e6)))
    assert(st("b") == ((2L, 7.25)))
  }
}
