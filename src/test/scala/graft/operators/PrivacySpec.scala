package graft.operators

import graft.SparkSpec

/** k-anonymity / l-diversity audit: violation selection, null QI
  * groups, passing groups absent. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("flags small groups and low-diversity groups, skips passing ones") {
    val df = Seq(
      // group (a,x): 3 rows, 3 distinct sensitive → passes both
      ("a", "x", 1.0), ("a", "x", 2.0), ("a", "x", 3.0),
      // group (a,y): 1 row → k fails (and l with l=2)
      ("a", "y", 9.0),
      // group (b,x): 3 rows but ONE sensitive value → l fails only
      ("b", "x", 7.0), ("b", "x", 7.0), ("b", "x", 7.0))
      .toDF("qi1", "qi2", "s")
    val out = Privacy.kAnonymityAudit(df, Seq("qi1", "qi2"), "s", k = 2, l = 2)
      .orderBy("qi1", "qi2").collect()
    val got = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("a", "y", 1L, 1L, false, false),
      ("b", "x", 3L, 1L, true, false)))
  }

  test("null quasi-identifier values form their own auditable group") {
    val df = Seq[(java.lang.Long, Double)]((null, 1.0), (1L, 2.0), (1L, 3.0))
      .toDF("qi", "s")
    val out = Privacy.kAnonymityAudit(df, Seq("qi"), "s", k = 2, l = 1)
      .collect()
    assert(out.length == 1 && out.head.isNullAt(0) &&
      out.head.getLong(1) == 1L)
  }

  // ─────────────── DP noisy-count release ───────────────

  test("dp release is deterministic per (group, salt) and salt-sensitive") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000)
      .selectExpr("CAST(id % 7 AS STRING) AS g")
    def release(salt: String) =
      Privacy.dpNoisyCounts(df, "g", eps = 0.5, salt = salt)
        .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = release("s1"); val b = release("s1"); val c = release("s2")
    assert(a.toSeq == b.toSeq)          // rerun publishes the SAME numbers
    assert(a.toSeq != c.toSeq)          // a new salt is a new mechanism draw
    assert(a.forall { case (_, v) => math.abs(v - 1000.0 / 7) < 80 })
  }

  test("seeded noise is Laplace(b)-shaped: median |x| near b·ln2, mean near 0") {
    import org.apache.spark.sql.functions._
    val b = 2.0
    val noise = spark.range(0, 10000).toDF("g")
      .select(Privacy.laplaceNoise(col("g"), "spec", b).as("x"))
      .collect().map(_.getDouble(0))
    val mean = noise.sum / noise.length
    val medAbs = noise.map(math.abs).sorted.apply(noise.length / 2)
    assert(math.abs(mean) < 0.15, s"mean $mean")
    assert(math.abs(medAbs - b * math.log(2.0)) < 0.15, s"medianAbs $medAbs")
  }

  test("dp release rejects invalid epsilon / sensitivity / empty salt") {
    val df = Seq("a").toDF("g")
    assertThrows[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", eps = 0.0, salt = "x")
    }
    assertThrows[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", eps = 1.0, salt = "x", sensitivity = 0.0)
    }
    assertThrows[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", eps = 1.0, salt = "")
    }
  }
}
