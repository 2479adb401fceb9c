package graft.operators

import graft.SparkSpec

/** Gaps-and-islands coalescing: overlap, touch, gap, per-key
  * isolation, layout independence. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // key a: [0,10] [5,12] overlap → island 1; [12,20] touches → still 1;
    // [25,30] after a gap → island 2
    ("a", 0L, 10L, 1L), ("a", 5L, 12L, 2L), ("a", 12L, 20L, 3L),
    ("a", 25L, 30L, 4L),
    // key b: a single point interval
    ("b", 7L, 7L, 5L))

  test("overlapping and touching intervals merge; gaps split islands") {
    val out = Intervals.coalesceIntervals(
        rows.toDF("k", "s", "e", "id"), "k", "s", "e", "id")
      .orderBy("k", "island").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 1L, 0L, 20L, 3L), ("a", 2L, 25L, 30L, 1L),
      ("b", 1L, 7L, 7L, 1L)))
  }

  test("island assignment is layout-independent") {
    val base = Intervals.coalesceIntervals(
      rows.toDF("k", "s", "e", "id"), "k", "s", "e", "id")
      .orderBy("k", "island").collect().toSeq
    val re = Intervals.coalesceIntervals(
      rows.toDF("k", "s", "e", "id").repartition(7), "k", "s", "e", "id")
      .orderBy("k", "island").collect().toSeq
    assert(base == re)
  }

  test("peak concurrency: sweep-line max with half-open boundaries") {
    // [0,10] [5,15] [8,12] overlap 3-deep at t∈[8,10); [10,20] starts
    // exactly when the first ends → must NOT count a 4th
    val df = Seq((0L, 10L, 1L), (5L, 15L, 2L), (8L, 12L, 3L),
      (10L, 20L, 4L)).toDF("s", "e", "id")
    val r = Intervals.peakConcurrency(df, "s", "e", "id").head()
    assert(r.getAs[Long]("n_intervals") == 4L)
    assert(r.getAs[Long]("peak") == 3L)
    // disjoint intervals → peak 1, any layout
    val disj = Seq((0L, 1L, 1L), (2L, 3L, 2L), (4L, 5L, 3L))
      .toDF("s", "e", "id")
    assert(Intervals.peakConcurrency(disj.repartition(5), "s", "e", "id")
      .head().getAs[Long]("peak") == 1L)
  }

  test("an interval contained in an earlier long one does not split") {
    // [0,100] swallows [10,20] and [30,40]
    val df = Seq(("k", 0L, 100L, 1L), ("k", 10L, 20L, 2L),
      ("k", 30L, 40L, 3L)).toDF("k", "s", "e", "id")
    val out = Intervals.coalesceIntervals(df, "k", "s", "e", "id").collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 0L && out.head.getLong(3) == 100L)
  }
}
