package graft.operators

import graft.SparkSpec

/** CDC net-effect compaction: all four first/last rules, final-value
  * carry, single-op passthrough. */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  test("compacts I..D to nothing, carries final values otherwise") {
    val ch = Seq(
      // k=1: I then U → net I with the U's values
      (1L, "I", 10.0, 1L), (1L, "U", 11.0, 2L),
      // k=2: I then D → net nothing
      (2L, "I", 20.0, 1L), (2L, "D", 20.0, 2L),
      // k=3: U then D → net D
      (3L, "U", 30.0, 1L), (3L, "D", 30.0, 2L),
      // k=4: U then U → net U with the last values
      (4L, "U", 40.0, 1L), (4L, "U", 41.0, 2L),
      // k=5: single I; k=6: single D
      (5L, "I", 50.0, 1L), (6L, "D", 60.0, 1L))
      .toDF("k", "op", "v", "ts")
    val got = Changelog.netEffect(ch, "k", "op", "ts", "ts", Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "I", 11.0), (3L, "D", 30.0), (4L, "U", 41.0),
      (5L, "I", 50.0), (6L, "D", 60.0)))
  }

  test("net effect is layout-independent") {
    val ch = (1L to 60L).flatMap(k => Seq(
      (k, if (k % 2 == 0) "I" else "U", k * 1.0, 1L),
      (k, if (k % 5 == 0) "D" else "U", k * 2.0, 2L)))
      .toDF("k", "op", "v", "ts")
    val a = Changelog.netEffect(ch, "k", "op", "ts", "ts", Seq("v"))
      .orderBy("k").collect().toSeq
    val b = Changelog.netEffect(ch.repartition(7), "k", "op", "ts", "ts",
      Seq("v")).orderBy("k").collect().toSeq
    assert(a == b)
  }
}
