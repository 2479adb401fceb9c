package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("applyChanges: latest version wins; deletes drop; inserts appear") {
    val changes = Seq(
      // two updates to key 1 — version 3 must win
      (1L, "a2", 11.0, 2L, "U"),
      (1L, "a3", 12.0, 3L, "U"),
      // delete key 2
      (2L, "b", 20.0, 2L, "D"),
      // insert new key 5
      (5L, "e", 50.0, 1L, "I")
    ).toDF("k", "s", "v", "version", "op")
    val out = MergeInto.applyChanges(snapshot, changes, Seq("k"), "version", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a3", 12.0), // latest update
      (3L, "c", 30.0), (4L, "d", 40.0), // untouched
      (5L, "e", 50.0))) // insert; key 2 deleted
  }

  test("applyChanges: a delete outranked by a later update upserts") {
    val changes = Seq(
      (3L, "c", 30.0, 1L, "D"),
      (3L, "c9", 99.0, 2L, "U")
    ).toDF("k", "s", "v", "version", "op")
    val out = MergeInto.applyChanges(snapshot, changes, Seq("k"), "version", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out.find(_._1 == 3L).contains((3L, "c9", 99.0)))
    assert(out.size == 4)
  }

  test("applyChanges validates its inputs") {
    assertThrows[IllegalArgumentException] {
      MergeInto.applyChanges(snapshot, snapshot, Seq("k"), "version", "op")
    }
    assertThrows[IllegalArgumentException] {
      MergeInto.applyChanges(snapshot.withColumn("__rn", lit(1)),
        snapshot.withColumn("__rn", lit(1))
          .withColumn("version", lit(1L)).withColumn("op", lit("U")),
        Seq("k"), "version", "op")
    }
  }
}
