package graft.apps

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.{FlightModel, FlightPipeline}
import graft.operators.{Cleaning, Prepare}
import graft.sources.{IO, Schemas}

/** CLI lifecycle mirroring the reference's entry points
  * (`/root/reference/src/main/main.py:31-263`):
  *
  *   TrainApp <flights.csv[.bz2]> <outputDir> [--count-only] [--plane-data p]
  *            [--test-file scoring.csv]
  *
  * train: CSV scan → leakage drop → prepare → pipeline fit → DT train →
  * ±10-min labels → parquet + single-file CSV sinks → MAE/RMSE report.
  * `--test-file` reuses the fitted pipeline+model on a held-out file
  * (train-once / score-many — `main.py:170-260`).
  */
object TrainApp {

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length >= 2,
      "usage: TrainApp <input.csv> <outputDir> [--count-only] [--plane-data p] [--test-file t]")
    val Array(inputPath, outputDir) = positional.take(2)
    val countOnly = args.contains("--count-only")
    def optArg(flag: String): Option[String] = {
      val i = args.indexOf(flag); if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }

    val spark = session()
    try run(spark, inputPath, outputDir, countOnly,
      optArg("--plane-data"), optArg("--test-file"))
    finally spark.stop()
  }

  def session(appName: String = "FlightDelayPredictionApp"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = SparkSession.builder()
      .appName(appName)
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR") // reference log level (log4j.properties)
    s
  }

  def run(spark: SparkSession, inputPath: String, outputDir: String,
      countOnly: Boolean, planePath: Option[String], testFile: Option[String]): Unit = {

    val raw = IO.readCsv(spark, inputPath, Some(Schemas.flights))
    if (countOnly) { // main.py:74-77
      println(s"[count-only] rows=${raw.count()}")
      return
    }

    val plane = planePath
      .map(p => IO.readCsv(spark, p, Some(Schemas.planeData)))
      .getOrElse(graft.sources.FlightsGenerator.planeData(spark))

    val fullData = Cleaning.dropForbidden(raw)
    val prepared = Prepare.prepareData(fullData, plane).cache()

    val pipelineModel: PipelineModel = FlightPipeline().fit(prepared)
    val result = FlightModel.trainModel(prepared, pipelineModel)

    result.predictions.foreach { preds =>
      val labeled = FlightModel.addLabels(preds)
      sink(labeled, outputDir, "predictions")
      FlightModel.evaluate(labeled).foreach { case (mae, rmse) =>
        println(f"[train] MAE=$mae%.3f RMSE=$rmse%.3f")
      }
    }
    // predictions are sunk and evaluated — safe to drop the cached feature
    // table their lineage runs through
    result.release()

    testFile.foreach { tf => // scoring lifecycle, main.py:170-260
      val test = IO.readCsv(spark, tf, Some(Schemas.flights))
      val testPrepared = Prepare.prepareData(Cleaning.dropForbidden(test), plane)
      val transformed = pipelineModel.transform(testPrepared)
      val scored = result.model match {
        case Some(m) => m.transform(transformed)
        case None => transformed
      }
      val labeled = FlightModel.addLabels(scored)
      sink(labeled, outputDir, "test_predictions")
      if (labeled.columns.contains("prediction") &&
          labeled.columns.contains(FlightModel.TargetCol))
        FlightModel.evaluate(labeled).foreach { case (mae, rmse) =>
          println(f"[score] MAE=$mae%.3f RMSE=$rmse%.3f")
        }
    }
    prepared.unpersist()
  }

  /** S4 + S5/S6: parquet dir + single-file CSV of the primitive columns
    * (`main.py:116-162`). */
  private def sink(df: DataFrame, outputDir: String, name: String): Unit = {
    IO.writeParquet(df, s"$outputDir/$name.parquet")
    IO.writeSingleCsv(df, s"$outputDir/${name}_csv", s"$outputDir/$name.csv")
  }
}
