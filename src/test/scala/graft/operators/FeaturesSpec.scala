package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-operator semantics tests for Features (SURVEY.md §5 unit plan):
  * HHMM parsing edge cases, trig identities, TOD bucket boundaries, weekend
  * set, slack thresholds — all against the reference's documented behavior
  * (`/root/reference/src/main/dataset_utils.py:79-117`,
  * `/root/reference/src/main/custom_features.py`). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("timeAsInt strips non-digits; empty string becomes null") {
    val df = Seq("0730", "07:30", "730", "", "ab", "2359").toDF("t")
      .select(Features.timeAsInt(col("t")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(730), Some(730), Some(730), None, None, Some(2359)))
  }

  test("hour/minute extraction truncates after double division") {
    val df = Seq(2359, 0, 59, 100, 1824).toDF("t").select(
      Features.hourFromTime(col("t")).as("h"),
      Features.minuteFromTime(col("t")).as("m"),
      Features.minutesSinceMidnight(col("t")).as("msm"))
    assert(df.collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))) ==
      Seq((23, 59, 1439), (0, 0, 0), (0, 59, 59), (1, 0, 60), (18, 24, 1104)))
  }

  test("cyclical localtime: null time rows filtered, sin^2+cos^2 = 1") {
    val df = Seq(Some(1824), None, Some(0)).toDF("DepTime")
    val out = Features.cyclicalLocaltime(df, "DepTime")
    assert(out.count() == 2) // null row dropped by the per-column filter
    val ok = out.select(
      (pow(col("DepTime_minutes_sine"), 2) + pow(col("DepTime_minutes_cosine"), 2)).as("s"))
      .collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(ok)
  }

  test("polar month/week matches reference formula incl. (v-1)/max and pi/2 shift") {
    val df = Seq((1, 1, 1), (12, 31, 7), (6, 15, 3))
      .toDF("Month", "DayofMonth", "DayOfWeek")
    val out = Features.cyclicalMonthWeek(df).where(col("Month") === 1).first()
    // v=1, max=12: angle = 0 + pi/2 → x = cos(pi/2) ≈ 0, y = 1
    assert(math.abs(out.getAs[Double]("Month_polar_x")) < 1e-9)
    assert(math.abs(out.getAs[Double]("Month_polar_y") - 1.0) < 1e-9)
  }

  test("TOD buckets: boundaries 4/5, 11/12, 18/19, 23 and null→unknown") {
    val df = Seq[Integer](4, 5, 11, 12, 18, 19, 23, 0, null, 99)
      .toDF("h").select(Features.timeOfDay(col("h")).as("tod"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq(
      "night", "morning", "morning", "afternoon", "afternoon", "evening",
      "evening", "night", "unknown", "unknown"))
  }

  test("native TOD and registered UDF agree everywhere") {
    Features.registerTimeOfDayUdf(spark)
    val hours = (Seq[Integer](null) ++ (-2 to 30).map(Integer.valueOf)).toDF("h")
    val mismatches = hours.select(
      Features.timeOfDay(col("h")).as("native"),
      call_udf("categorize_time", col("h")).as("udf"))
      .filter(col("native") =!= col("udf")).count()
    assert(mismatches == 0)
  }

  test("weekend indicator uses DayOfWeek in {5,6,7}") {
    val df = (1 to 7).toDF("DayOfWeek")
    val out = Features.addWeekendIndicator(df)
      .orderBy("DayOfWeek").collect().map(_.getAs[String]("Weekend"))
    assert(out.toSeq == Seq("Weekday", "Weekday", "Weekday", "Weekday",
      "Weekend", "Weekend", "Weekend"))
  }

  test("schedule-slack buckets at 30/60/120; null → MORE_THAN_ENOUGH") {
    val df = Seq(
      (900, 920),   // 20 min  → NOT_ENOUGH
      (900, 930),   // 30 min  → NOT_ENOUGH (<=30)
      (900, 931),   // 31 min  → BARELY_ENOUGH
      (900, 1000),  // 60 min  → BARELY_ENOUGH
      (900, 1100),  // 120 min → ENOUGH
      (900, 1101)   // 121 min → MORE_THAN_ENOUGH
    ).toDF("CRSDepTime", "CRSArrTime")
    val out = Features.addEnoughTimeEstimation(df)
      .select("TimeBetweenDepartures").collect().map(_.getString(0))
    assert(out.toSeq == Seq("NOT_ENOUGH", "NOT_ENOUGH", "BARELY_ENOUGH",
      "BARELY_ENOUGH", "ENOUGH", "MORE_THAN_ENOUGH"))
    val nullCase = Features.addEnoughTimeEstimation(
      Seq((Option.empty[Int], Some(900))).toDF("CRSDepTime", "CRSArrTime"))
      .select("TimeBetweenDepartures").first().getString(0)
    assert(nullCase == "MORE_THAN_ENOUGH")
  }

  test("lag window: previous CRSDepTime within FlightNum ordered by time") {
    val df = Seq((7, 900), (7, 1100), (7, 600), (9, 800))
      .toDF("FlightNum", "CRSDepTime")
    val out = Features.addTimeSincePreviousDeparture(df)
      .where(col("FlightNum") === 7 && col("CRSDepTime") === 900).first()
    assert(out.getAs[Int]("PrevDeparture") == 600) // 600 precedes 900
    assert(out.getAs[Int]("TimeSincePrevDeparture") == 180)
  }
}
