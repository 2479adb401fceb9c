package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Projection

/** JlProject — the fused codegen'd JL projection must be value-identical
  * to the HOF twin (zip_with multiply + decimal aggregate) on every edge
  * the twin defines, decimal accumulation included. */
class JlProjectFusedSpec extends SparkSpec {
  import spark.implicits._

  test("value parity with the HOF twin on random vectors") {
    val df = spark.range(0, 1500).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(16)(r.nextGaussian() * 3))
    }.toDF("id", "v").repartition(7)
    val fused = Projection.randomProject(df, "v", 16, 4, "spec")
      .select(col("id"), col("proj"))
    val hof = Projection.randomProjectHof(df, "v", 16, 4, "spec")
      .select(col("id"), col("proj").as("proj_hof"))
    val mismatches = fused.join(hof, "id")
      .filter(col("proj") =!= col("proj_hof")).count()
    assert(mismatches == 0)
  }

  test("half-boundary products accumulate through the same scale-9 decimal") {
    // 0.0000000005 · (+1) rounds HALF_UP at scale 9 — a floor-based
    // accumulation would diverge here
    val df = Seq((1L, Seq(0.0000000005, 0.15, -0.0000000015, 0.25)))
      .toDF("id", "v")
    val f = Projection.randomProject(df, "v", 4, 2, "hb")
      .select(col("proj")).head().getSeq[Double](0)
    val h = Projection.randomProjectHof(df, "v", 4, 2, "hb")
      .select(col("proj")).head().getSeq[Double](0)
    assert(f == h)
  }

  test("null element / length mismatch poison all components; null vector is null") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), None, Some(2.0), Some(3.0)))),  // null element
      (2L, Some(Seq(Some(1.0), Some(2.0)))),                    // too short
      (3L, Some(Seq.fill(6)(Option(1.0)))),                     // too long
      (4L, Option.empty[Seq[Option[Double]]])                   // null vector
    ).toDF("id", "v")
    val f = Projection.randomProject(df, "v", 4, 3, "np")
      .select(col("id"), col("proj")).collect()
    val h = Projection.randomProjectHof(df, "v", 4, 3, "np")
      .select(col("id"), col("proj")).collect()
    f.zip(h).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      if (a.isNullAt(1)) assert(b.isNullAt(1), s"twin disagrees on ${a.getLong(0)}")
      else assert(a.getSeq[Any](1) == b.getSeq[Any](1),
        s"id ${a.getLong(0)}: ${a.getSeq[Any](1)} vs ${b.getSeq[Any](1)}")
    }
    // pin the semantics, not just twin agreement
    val byId = f.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[Any](1).forall(_ == null))
    assert(byId(2L).getSeq[Any](1).forall(_ == null))
    assert(byId(3L).getSeq[Any](1).forall(_ == null))
    assert(byId(4L).isNullAt(1))
  }

  test("the fused projection stays inside whole-stage codegen") {
    val df = spark.range(50).select(array(
      col("id").cast("double"), (col("id") + 1).cast("double")).as("v"))
    val plan = Projection.randomProject(df, "v", 2, 1, "wscg")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"),
      s"fused projection must not plan a higher-order function:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("jl_project")),
      s"fused projection fell out of whole-stage codegen:\n$plan")
  }

  test("constructor validates the sign matrix and scale") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val b = BoundReference(0, ArrayType(DoubleType), nullable = true)
    intercept[IllegalArgumentException](
      JlProject(b, Array.empty[Array[Double]], 1.0))
    intercept[IllegalArgumentException](
      JlProject(b, Array(Array(1.0, 0.5)), 1.0))
    intercept[IllegalArgumentException](
      JlProject(b, Array(Array(1.0), Array(1.0, -1.0)), 1.0))
    intercept[IllegalArgumentException](
      JlProject(b, Array(Array(1.0)), 0.0))
  }
}
