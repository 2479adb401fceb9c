package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cleaning/join/dedup semantics vs the reference
  * (`/root/reference/src/main/dataset_utils.py:11-52,121-135`). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def flights = Seq(
    // Month, DayofMonth, DayOfWeek, FlightNum, Origin, CRSDepTime, Cancelled, ArrDelay, Distance, Year, CancellationCode, TailNum
    (1, 2, 3, 100, "JFK", 900, 0, Some(5), Some(200), 2007, "", "N1"),
    (1, 2, 3, 100, "JFK", 900, 0, Some(7), Some(200), 2007, "", "N1"),   // dup key
    (1, 2, 3, 101, "LAX", 930, 1, Some(5), Some(300), 2007, "A", "N2"),  // cancelled
    (2, 3, 4, 102, "SFO", 1000, 0, None, Some(300), 2007, "", "N3"),     // null delay
    (2, 3, 4, 103, "SEA", 1030, 0, Some(9), None, 2007, "", "N9")        // null distance
  ).toDF("Month", "DayofMonth", "DayOfWeek", "FlightNum", "Origin",
    "CRSDepTime", "Cancelled", "ArrDelay", "Distance", "Year",
    "CancellationCode", "TailNum")

  test("unique_id concatenates the 7 reference key columns with underscores") {
    val id = Cleaning.appendUniqueId(flights)
      .where(col("FlightNum") === 100).select("unique_id").first().getString(0)
    assert(id == "1_2_3_100_JFK_900_0")
  }

  test("cleanData filters null-delay/cancelled/null-distance, drops cols, dedups") {
    val out = Cleaning.cleanData(Cleaning.appendUniqueId(flights))
    assert(out.count() == 1) // only the first row survives (dup collapsed)
    assert(!out.columns.contains("Year") && !out.columns.contains("Cancelled")
      && !out.columns.contains("CancellationCode"))
  }

  test("preparePlaneData: na.drop(minNonNulls=4) keeps rows with >=4 of 7 non-null") {
    val plane = Seq(
      ("N1", "t", "m", "mod", "at", "et", "1999", "d", "s"),     // all present
      ("N2", null, null, null, null, null, null, null, null),     // only tailnum
      ("N3", "t", "m", "mod", null, null, null, null, null)       // 4 non-null
    ).toDF("tailnum", "type", "manufacturer", "model", "aircraft_type",
      "engine_type", "year", "issue_date", "status")
    val out = Cleaning.preparePlaneData(plane)
    assert(out.columns.contains("year_plane") && !out.columns.contains("issue_date"))
    assert(out.select("tailnum").collect().map(_.getString(0)).toSet == Set("N1", "N3"))
  }

  test("joinPlaneData inner-joins on TailNum and drops the dim key") {
    val plane = Seq(("N1", "jet"), ("N7", "prop")).toDF("tailnum", "type")
    val out = Cleaning.joinPlaneData(flights, plane)
    assert(out.columns.contains("type") && !out.columns.contains("tailnum"))
    assert(out.select("TailNum").distinct().collect().map(_.getString(0)).toSeq == Seq("N1"))
  }

  test("missingTailNums (anti-join) equals reference subtract semantics") {
    val plane = Seq(("N1", "jet")).toDF("tailnum", "type")
    val anti = Cleaning.missingTailNums(flights, plane)
      .collect().map(_.getString(0)).toSet
    val except = Cleaning.missingTailNumsExcept(flights, plane)
      .collect().map(_.getString(0)).toSet
    assert(anti == Set("N2", "N3", "N9"))
    assert(anti == except)
  }

  test("dropForbidden removes exactly the 10 leakage columns (P1)") {
    val wide = graft.sources.FlightsGenerator.flights(spark, 5)
    val out = Cleaning.dropForbidden(wide)
    assert(wide.columns.length - out.columns.length == 10)
    graft.sources.Schemas.forbiddenVariables.foreach(c =>
      assert(!out.columns.contains(c), s"$c not dropped"))
    assert(out.columns.contains("DepDelay")) // predictors survive
  }

  test("duplicateRows returns only rank>1 rows within the key") {
    val dups = Cleaning.duplicateRows(Cleaning.appendUniqueId(flights), "unique_id")
    assert(dups.count() == 1)
  }
}
