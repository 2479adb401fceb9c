package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Schemas

/** Relational cleaning / dedup / join stages (SURVEY.md §2.2-2.3, §2.6-2.7).
  *
  * Each stage is a pure `DataFrame => DataFrame`, the Scala analogue of the
  * reference's function-per-transform style
  * (`/root/reference/src/main/dataset_utils.py`). Anti-patterns in the
  * reference are rewritten to their scalable Spark-first equivalents with
  * identical result sets (SURVEY.md §4).
  */
object Cleaning {

  /** F1: synthetic composite key from 7 identifying columns
    * (`dataset_utils.py:130-135`). */
  def appendUniqueId(df: DataFrame): DataFrame = {
    val keyCols = Seq("Month", "DayofMonth", "DayOfWeek", "FlightNum",
      "Origin", "CRSDepTime", "Cancelled")
    df.withColumn("unique_id", concat_ws("_", keyCols.map(col): _*))
  }

  /** P1: drop the 10 leakage columns (`helper_methods.py:22-33`). */
  def dropForbidden(df: DataFrame): DataFrame =
    df.drop(Schemas.forbiddenVariables: _*)

  /** P5 + P2 + D1: keep rows with a label, uncancelled, with a distance;
    * drop bookkeeping columns; dedup on the synthetic key
    * (`dataset_utils.py:121-127`). */
  def cleanData(df: DataFrame): DataFrame =
    df.drop("Year", "CancellationCode")
      .filter(col("ArrDelay").isNotNull && col("Cancelled") === 0)
      .filter(col("Distance").isNotNull)
      .drop("Cancelled")
      .dropDuplicates("unique_id")

  /** D4 + P2: plane-dimension prep — drop sparse rows (≥4 of the 6 retained
    * attributes non-null), drop `issue_date`/`status`, rename `year` to
    * avoid colliding with flights (`dataset_utils.py:33-44`). */
  def preparePlaneData(plane: DataFrame): DataFrame =
    plane
      .drop("issue_date", "status")
      .na.drop(minNonNulls = 4)
      .withColumnRenamed("year", "year_plane")

  /** J1: fact ⋈ dim inner equi-join on tail number
    * (`dataset_utils.py:47-50`). The dimension is ~5k rows, so we broadcast
    * explicitly — no shuffle of the fact side at any scale. */
  def joinPlaneData(flights: DataFrame, planePrepared: DataFrame): DataFrame =
    flights
      .join(broadcast(planePrepared),
        flights("TailNum") === planePrepared("tailnum"), "inner")
      // drop via the dim's column reference: a bare drop("tailnum") would
      // case-insensitively drop the fact side's TailNum too
      .drop(planePrepared("tailnum"))

  /** J2/SO1: tail numbers present in flights but missing from plane-data.
    *
    * The reference computes this as distinct-minus-distinct then collects to
    * the driver for an IN-list filter (`dataset_utils.py:12-17`) — a
    * driver-side materialization that cannot work at scale. Same result set
    * via a distributed left-anti join.
    */
  def missingTailNums(flights: DataFrame, plane: DataFrame): DataFrame = {
    val flightKeys = flights.select(col("TailNum")).distinct()
    val planeKeys = plane.select(col("tailnum")).distinct()
    flightKeys.join(broadcast(planeKeys),
      flightKeys("TailNum") === planeKeys("tailnum"), "left_anti")
  }

  /** Reference-exact variant of J2 for the capability surface: EXCEPT
    * DISTINCT of the two key sets (`dataset_utils.py:12-14`). */
  def missingTailNumsExcept(flights: DataFrame, plane: DataFrame): DataFrame =
    flights.select(col("TailNum").as("key")).distinct()
      .except(plane.select(col("tailnum").as("key")).distinct())

  /** W1/D6: the duplicate rows themselves (rank > 1 within the key) —
    * the reference's dedup-inspection query (`helper_methods.py:171-179`). */
  def duplicateRows(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(key))
    df.withColumn("row_number", row_number().over(w))
      .filter(col("row_number") > 1)
      .drop("row_number")
  }
}
