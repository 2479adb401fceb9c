package graft.sources

import org.apache.spark.sql.types._

/** Explicit schemas for the flight-domain tables.
  *
  * The reference infers all schemas at scan time (an extra full pass over the
  * file — `/root/reference/src/main/helper_methods.py:373`). At 100 TB an
  * inference pass is unacceptable, so the engine defaults to these explicit
  * `StructType`s and keeps inference as an opt-in compatibility mode.
  *
  * Column set and types follow
  * `/root/reference/src/main/dataset/variable-descriptions.csv:4-32` and the
  * generator header `/root/reference/tools/generate_flights.py:77-82`; the
  * plane-data header is `/root/reference/src/main/dataset/plane-data.csv:1`.
  */
object Schemas {

  /** 29-column flights fact table. All times are HHMM local integers. */
  val flights: StructType = StructType(Seq(
    StructField("Year", IntegerType),
    StructField("Month", IntegerType),
    StructField("DayofMonth", IntegerType),
    StructField("DayOfWeek", IntegerType),
    StructField("DepTime", IntegerType),
    StructField("CRSDepTime", IntegerType),
    StructField("ArrTime", IntegerType),
    StructField("CRSArrTime", IntegerType),
    StructField("UniqueCarrier", StringType),
    StructField("FlightNum", IntegerType),
    StructField("TailNum", StringType),
    StructField("ActualElapsedTime", IntegerType),
    StructField("CRSElapsedTime", IntegerType),
    StructField("AirTime", IntegerType),
    StructField("ArrDelay", IntegerType),
    StructField("DepDelay", IntegerType),
    StructField("Origin", StringType),
    StructField("Dest", StringType),
    StructField("Distance", IntegerType),
    StructField("TaxiIn", IntegerType),
    StructField("TaxiOut", IntegerType),
    StructField("Cancelled", IntegerType),
    StructField("CancellationCode", StringType),
    StructField("Diverted", IntegerType),
    StructField("CarrierDelay", IntegerType),
    StructField("WeatherDelay", IntegerType),
    StructField("NASDelay", IntegerType),
    StructField("SecurityDelay", IntegerType),
    StructField("LateAircraftDelay", IntegerType)))

  /** 9-column aircraft metadata dimension (≈5k rows — always broadcastable). */
  val planeData: StructType = StructType(Seq(
    StructField("tailnum", StringType),
    StructField("type", StringType),
    StructField("manufacturer", StringType),
    StructField("issue_date", StringType),
    StructField("model", StringType),
    StructField("status", StringType),
    StructField("aircraft_type", StringType),
    StructField("engine_type", StringType),
    StructField("year", StringType)))

  /** `airports.csv` — shipped with the reference, part of the data-model
    * surface (`/root/reference/src/main/dataset/airports.csv:1`). */
  val airports: StructType = StructType(Seq(
    StructField("iata", StringType),
    StructField("airport", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType)))

  /** `carriers.csv` (`/root/reference/src/main/dataset/carriers.csv:1`). */
  val carriers: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Description", StringType)))

  /** The 10 leakage columns the reference drops before any modelling
    * (`/root/reference/src/main/helper_methods.py:22-31`). */
  val forbiddenVariables: Seq[String] = Seq(
    "ArrTime", "ActualElapsedTime", "AirTime", "TaxiIn", "Diverted",
    "CarrierDelay", "WeatherDelay", "NASDelay", "SecurityDelay",
    "LateAircraftDelay")
}
