package graft.operators

import graft.SparkSpec

/** Snapshot diff: change classification, column masks, null
  * transitions. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq[(Long, String, java.lang.Double)](
    (1L, "A", Double.box(10.0)),   // unchanged
    (2L, "B", Double.box(20.0)),   // status changes
    (3L, "C", Double.box(30.0)),   // both change
    (4L, "D", null),               // null → value (a change)
    (5L, "E", Double.box(50.0))    // removed
  ).toDF("k", "s", "v")

  private val neu = Seq[(Long, String, java.lang.Double)](
    (1L, "A", Double.box(10.0)),
    (2L, "X", Double.box(20.0)),
    (3L, "Y", Double.box(31.0)),
    (4L, "D", Double.box(40.0)),
    (6L, "F", Double.box(60.0))    // added
  ).toDF("k", "s", "v")

  test("classifies added/removed/changed/unchanged with exact masks") {
    val out = Snapshot.diff(old, neu, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "s"),
      (3L, "changed", "s,v"),
      (4L, "changed", "v"),
      (5L, "removed", ""),
      (6L, "added", "")))
  }

  test("identical snapshots diff to all-unchanged") {
    val out = Snapshot.diff(old, old, Seq("k"), Seq("s", "v")).collect()
    assert(out.length == 5)
    assert(out.forall(_.getString(1) == "unchanged"))
  }
}
