package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent right
  * row with `rightTime <= leftTime` within the same key — the canonical
  * point-in-time lookup (DuckDB/kdb `ASOF JOIN`, pandas `merge_asof`).
  *
  * Spark has no built-in as-of join; the scalable formulation is
  * composition (preference (a) of the build brief), not a custom physical
  * operator: tag and UNION both sides, sort within each key partition by
  * (time, side) so right rows precede left rows at equal timestamps, and
  * carry the latest right payload forward with `last(…, ignoreNulls)` over
  * a running frame. ONE shuffle on the key — the same cost as a regular
  * join — with none of the range-explosion a windowed range-join would
  * have, and no per-key driver logic. State per partition during the sort
  * is one payload struct.
  */
object AsOfJoin {

  /** @param left       fact side, keeps all rows
    * @param right      lookup side
    * @param on         equi-key column names (present in both sides)
    * @param leftTime   left event-time column (any orderable type)
    * @param rightTime  right event-time column (same type)
    * @param rightCols  right payload columns to attach (null when no match);
    *                   emitted as `asof_<name>`
    * @param tolerance  optional max `leftTime - rightTime` distance, in the
    *                   time column's own units (numeric time columns only);
    *                   matches farther back are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct(col(rightTime).as("__t") +: rightCols.map(col): _*)

    val taggedRight = right.select(
      on.map(col) ++ Seq(col(rightTime).as("__time"), lit(0).as("__side"),
        payload.as("__r")) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val taggedLeft = left.select(
      on.map(col) ++ Seq(col(leftTime).as("__time"), lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(on.contains).map(c => col(c).as(s"__l_$c")): _*)

    // right (side 0) sorts before left (side 1) at equal time ⇒ `<=` match
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedRight.unionByName(taggedLeft)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTolerance = tolerance match {
      case Some(tol) =>
        joined.withColumn("__last_r",
          when(col("__time") - col("__last_r.__t") <= tol, col("__last_r")))
      case None => joined
    }

    withinTolerance.select(
      on.map(col) ++
        leftCols.filterNot(on.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"__last_r.$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `rightTime >= leftTime` within the same key (pandas
    * `merge_asof(direction='forward')`, DuckDB `ASOF JOIN … ON l.t <= r.t`).
    * Mirror of [[backward]]: left rows (side 0) sort before right rows
    * (side 1) at equal time so `>=` includes equality, and the next right
    * payload comes from `first(…, ignoreNulls)` over the following frame.
    * Same ONE-shuffle cost. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct(col(rightTime).as("__t") +: rightCols.map(col): _*)

    val taggedRight = right.select(
      on.map(col) ++ Seq(col(rightTime).as("__time"), lit(1).as("__side"),
        payload.as("__r")) ++
        leftCols.filterNot(on.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val taggedLeft = left.select(
      on.map(col) ++ Seq(col(leftTime).as("__time"), lit(0).as("__side"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(on.contains).map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = taggedRight.unionByName(taggedLeft)
      .withColumn("__next_r", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)

    val withinTolerance = tolerance match {
      case Some(tol) =>
        joined.withColumn("__next_r",
          when(col("__next_r.__t") - col("__time") <= tol, col("__next_r")))
      case None => joined
    }

    withinTolerance.select(
      on.map(col) ++
        leftCols.filterNot(on.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"__next_r.$c").as(s"asof_$c")): _*)
  }
}
