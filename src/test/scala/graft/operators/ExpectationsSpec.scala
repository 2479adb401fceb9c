package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(-5.0), "b"),
    (3L, None, "a"),     // null value: range rule can't evaluate → violation
    (3L, Some(7.0), "c") // duplicate key 3
  ).toDF("k", "v", "s")

  test("audit counts FALSE and NULL predicates as violations in one pass") {
    val out = Expectations.audit(df,
        rules = Seq(
          "v_positive" -> (col("v") > 0),
          "s_domain" -> col("s").isin("a", "b")),
        uniqueKeys = Seq("k_unique" -> Seq("k")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("v_positive") == ((4L, 2L, false)))  // -5 is FALSE, null is NULL
    assert(out("s_domain") == ((4L, 1L, false)))    // "c"
    assert(out("k_unique") == ((4L, 1L, false)))    // key 3 twice
  }

  test("audit is a single aggregate over the input") {
    val out = Expectations.audit(df,
      rules = Seq("r1" -> (col("v") > 0), "r2" -> col("s").isNotNull),
      uniqueKeys = Seq("u" -> Seq("k")))
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one aggregate, got ${aggs.size}")
  }

  test("audit validates rule names") {
    assertThrows[IllegalArgumentException] { Expectations.audit(df, Nil) }
    assertThrows[IllegalArgumentException] {
      Expectations.audit(df, Seq("dup" -> lit(true), "dup" -> lit(false)))
    }
    assertThrows[IllegalArgumentException] {
      Expectations.audit(df, Seq("bad'name" -> lit(true)))
    }
  }

  test("sequenceGaps finds holes; duplicates and nulls don't mask them") {
    import spark.implicits._
    val rows = Seq[(Long, java.lang.Long)](
      (1L, 1L), (1L, 2L), (1L, 3L),        // contiguous → absent
      (2L, 1L), (2L, 3L), (2L, 3L),        // missing 2; dup 3 no mask
      (3L, 5L), (3L, 8L),                  // missing 6, 7
      (4L, 1L), (4L, null))                // null drops; singleton → absent
      .toDF("k", "seq")
    val out = Expectations.sequenceGaps(rows, "k", "seq")
      .orderBy("k").collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((2L, 1L, 3L, 2L, 1L), (3L, 5L, 8L, 2L, 2L)))
  }
}
