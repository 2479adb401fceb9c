package graft.operators

import graft.SparkSpec

class AlignmentSpec extends SparkSpec {
  import spark.implicits._

  test("fitProcrustes recovers a planted 2D rotation") {
    val th = math.toRadians(30)
    val c = math.cos(th); val s = math.sin(th)
    // deterministic, well-spread unit-scale points; y = Rot(30°)·x
    val rows = (0 until 60).map { i =>
      val x0 = math.cos(i * 0.37); val x1 = math.sin(i * 0.71)
      (i.toLong, Seq(x0.toFloat, x1.toFloat),
        Seq((c * x0 - s * x1).toFloat, (s * x0 + c * x1).toFloat))
    }
    val df = rows.toDF("id", "x", "y")
    val m = Alignment.fitProcrustes(df, "x", "y", dim = 2)
    assert(m.n == 60L)
    assert(math.abs(m.rotation(0)(0) - c) < 1e-3)
    assert(math.abs(m.rotation(0)(1) + s) < 1e-3)
    assert(math.abs(m.rotation(1)(0) - s) < 1e-3)
    assert(math.abs(m.rotation(1)(1) - c) < 1e-3)
    assert(m.orthErr < 1e-5)
  }

  test("fitProcrustes rejects a rank-deficient cross-moment matrix") {
    // every vector on one axis → M has a zero singular value
    val rows = (0 until 10).map(i =>
      (i.toLong, Seq(1.0f + i * 0.01f, 0.0f), Seq(1.0f + i * 0.01f, 0.0f)))
    val df = rows.toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Alignment.fitProcrustes(df, "x", "y", dim = 2)
    }
    assert(e.getMessage.contains("rank-deficient"))
  }

  test("fitProcrustes is layout-independent (decimal moment sums)") {
    val th = math.toRadians(-110)
    val c = math.cos(th); val s = math.sin(th)
    val rows = (0 until 40).map { i =>
      val x0 = math.cos(i * 0.53); val x1 = math.sin(i * 0.29)
      (i.toLong, Seq(x0.toFloat, x1.toFloat),
        Seq((c * x0 - s * x1).toFloat, (s * x0 + c * x1).toFloat))
    }
    val df = rows.toDF("id", "x", "y")
    val a = Alignment.fitProcrustes(df, "x", "y", dim = 2)
    val b = Alignment.fitProcrustes(df.repartition(7), "x", "y", dim = 2)
    assert(a.rotation.flatten.toSeq == b.rotation.flatten.toSeq)
  }
}
