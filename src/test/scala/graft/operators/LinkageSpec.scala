package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Survivorship: precedence pick per cluster, singleton passthrough,
  * deterministic tie break. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("golden record is the precedence-first member; singletons pass") {
    val records = Seq(
      (1L, "acme corp", 10.0),
      (2L, "acme corp.", 30.0),   // cluster {1,2,3}: highest balance
      (3L, "acme", 20.0),
      (7L, "zeta llc", 5.0))      // not in any cluster → own golden
      .toDF("id_", "name", "bal")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val out = Linkage.goldenRecords(records, "id_", clusters,
        Seq(col("bal").desc))
      .orderBy("cluster").collect()
    val got = out.map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("id_"),
      r.getAs[Long]("n_members"))).toSeq
    assert(got == Seq((1L, 2L, 3L), (7L, 7L, 1L)))
  }

  test("token-sort keys group permutations, not different multisets") {
    val df = Seq(
      (1L, "Acme Trading Corp"),
      (2L, "corp acme trading"),   // permutation + case → same key
      (3L, "acme acme trading"),   // different MULTISET → no group
      (4L, "zeta llc"))
      .toDF("id_", "name")
    val out = Linkage.tokenSortGroups(df, "id_", "name").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "acme corp trading")
    assert(out.head.getAs[Long]("n") == 2L)
    assert(out.head.getAs[Long]("min_id") == 1L)
    assert(out.head.getAs[Long]("max_id") == 2L)
  }

  test("equal precedence breaks ties by ascending id") {
    val records = Seq((5L, "a", 1.0), (4L, "b", 1.0)).toDF("id_", "name", "bal")
    val clusters = Seq((4L, 4L), (5L, 4L)).toDF("id", "cluster")
    val out = Linkage.goldenRecords(records, "id_", clusters,
      Seq(col("bal").desc)).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id_") == 4L)
  }
}
