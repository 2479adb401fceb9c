package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.util.Random

/** Deterministic synthetic flight-domain fixtures for tests and load runs —
  * our analogue of the reference's generator
  * (`/root/reference/tools/generate_flights.py`, schema at `:77-82`): same
  * schema and statistical shape (HHMM times, DepDelay correlated with
  * ArrDelay, a TailNum pool partially covered by plane-data, a few percent
  * cancelled/null rows), independently implemented.
  */
object FlightsGenerator {

  private val Carriers = Seq("AA", "UA", "DL", "WN", "B6", "AS", "NK", "F9")
  private val Airports = Seq("ATL", "ORD", "DFW", "LAX", "JFK", "DEN", "SFO",
    "SEA", "PHX", "IAH", "MIA", "BOS", "MSP", "DTW", "CLT")
  private val Manufacturers = Seq("BOEING", "AIRBUS", "EMBRAER", "BOMBARDIER")
  private val Models = Seq("737-700", "A320-200", "757-200", "ERJ-190", "CRJ-900")
  private val EngineTypes = Seq("Turbo-Fan", "Turbo-Jet", "Turbo-Prop")

  private def hhmm(minutesSinceMidnight: Int): Int = {
    val m = ((minutesSinceMidnight % 1440) + 1440) % 1440
    (m / 60) * 100 + (m % 60)
  }

  /** `n` synthetic flights with the 29-column reference schema. ~`nullFrac`
    * of rows carry a null ArrDelay/DepTime/Distance and ~2% are cancelled,
    * so cleaning paths have something to remove. `tailPool` controls the
    * TailNum universe (join selectivity against [[planeData]]).
    *
    * Generation is DISTRIBUTED: `spark.range(n)` partitions the id space
    * and every row derives its own splitmix-seeded RNG from (seed, id), so
    * output is deterministic, independent of partitioning, and scales to
    * any n (the driver never materializes rows — a driver-side Seq capped
    * the old version at memory and shipped megabyte tasks). */
  def flights(spark: SparkSession, n: Long, seed: Long = 42L,
      tailPool: Int = 500, nullFrac: Double = 0.03): DataFrame = {
    val numPartitions = math.max(1, math.min(200, n / 5000)).toInt
    val rows = spark.range(0, n, 1, numPartitions).rdd.map { i =>
      // splitmix64 scramble so per-row Randoms are decorrelated
      var z = seed + i * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val rnd = new Random(z ^ (z >>> 31))
      val month = 1 + rnd.nextInt(12)
      val dayOfMonth = 1 + rnd.nextInt(28)
      val dayOfWeek = 1 + rnd.nextInt(7)
      val crsDepMin = 5 * 60 + rnd.nextInt(18 * 60) // 05:00-23:00
      val depDelay = math.max(-20, (rnd.nextGaussian() * 18).toInt)
      val depMin = crsDepMin + depDelay
      val airTime = 40 + rnd.nextInt(300)
      val taxiOut = 5 + rnd.nextInt(40)
      val taxiIn = 2 + rnd.nextInt(15)
      // arrival delay correlated with departure delay + taxi-out noise
      val arrDelay = depDelay + (taxiOut - 20) / 2 + (rnd.nextGaussian() * 8).toInt
      val crsElapsed = airTime + 25
      val actualElapsed = airTime + taxiOut + taxiIn
      val crsArrMin = crsDepMin + crsElapsed
      val arrMin = depMin + actualElapsed
      val cancelled = if (rnd.nextDouble() < 0.02) 1 else 0
      val nullRow = rnd.nextDouble() < nullFrac
      val origin = Airports(rnd.nextInt(Airports.length))
      var dest = Airports(rnd.nextInt(Airports.length))
      if (dest == origin) dest = Airports((Airports.indexOf(origin) + 1) % Airports.length)

      Row(
        Integer.valueOf(2007),                                   // Year
        Integer.valueOf(month), Integer.valueOf(dayOfMonth), Integer.valueOf(dayOfWeek),
        if (nullRow) null else Integer.valueOf(hhmm(depMin)),    // DepTime
        Integer.valueOf(hhmm(crsDepMin)),                        // CRSDepTime
        Integer.valueOf(hhmm(arrMin)),                           // ArrTime
        Integer.valueOf(hhmm(crsArrMin)),                        // CRSArrTime
        Carriers(rnd.nextInt(Carriers.length)),                  // UniqueCarrier
        Integer.valueOf(1 + rnd.nextInt(800)),                   // FlightNum
        "N%03d".format(rnd.nextInt(tailPool)),                   // TailNum
        Integer.valueOf(actualElapsed), Integer.valueOf(crsElapsed), Integer.valueOf(airTime),
        if (nullRow || cancelled == 1) null else Integer.valueOf(arrDelay), // ArrDelay
        Integer.valueOf(depDelay),                               // DepDelay
        origin, dest,
        if (nullRow) null else Integer.valueOf(100 + rnd.nextInt(2500)), // Distance
        Integer.valueOf(taxiIn), Integer.valueOf(taxiOut),
        Integer.valueOf(cancelled),
        if (cancelled == 1) "A" else null,                       // CancellationCode
        Integer.valueOf(0),                                      // Diverted
        Integer.valueOf(0), Integer.valueOf(0), Integer.valueOf(0),
        Integer.valueOf(0), Integer.valueOf(0))                  // delay components
    }
    spark.createDataFrame(rows, Schemas.flights)
  }

  /** Plane-data dimension covering `coverage` of the flight TailNum pool;
    * ~10% of rows carry only the tailnum (all attributes null) to exercise
    * the `na.drop(minNonNulls=4)` path (`dataset_utils.py:37-38`). */
  def planeData(spark: SparkSession, tailPool: Int = 500, coverage: Double = 0.8,
      seed: Long = 43L): DataFrame = {
    val rnd = new Random(seed)
    val rows = (0 until tailPool).filter(_ => rnd.nextDouble() < coverage).map { i =>
      val sparse = rnd.nextDouble() < 0.1
      if (sparse)
        Row("N%03d".format(i), null, null, null, null, null, null, null, null)
      else
        Row(
          "N%03d".format(i),
          "Corporation",
          Manufacturers(rnd.nextInt(Manufacturers.length)),
          "%02d/%02d/%04d".format(1 + rnd.nextInt(12), 1 + rnd.nextInt(28), 1990 + rnd.nextInt(18)),
          Models(rnd.nextInt(Models.length)),
          "Valid",
          "Fixed Wing Multi-Engine",
          EngineTypes(rnd.nextInt(EngineTypes.length)),
          (1988 + rnd.nextInt(20)).toString)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.planeData)
  }
}
