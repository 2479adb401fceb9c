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
  *            [--test-file scoring.csv] [--save-model modelDir]
  *
  * train: CSV scan → leakage drop → prepare → pipeline fit → DT train →
  * ±10-min labels → parquet + single-file CSV sinks → MAE/RMSE report.
  * `--test-file` reuses the fitted pipeline+model on a held-out file
  * (train-once / score-many — `main.py:170-260`); `--save-model` persists
  * the fitted pipeline+tree so [[ScoreApp]] can score later runs without
  * retraining (the durable version of that lifecycle).
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
      optArg("--plane-data"), optArg("--test-file"), optArg("--save-model"))
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
      // the SAME planner configuration every driver-contract session runs
      // (Verify/Bench/DevProbe/EntrySmoke/MLQuality/PlanAudit/test): the
      // graft extensions register the SQL functions and the
      // TopKWindowRewrite optimizer rule, and the raised fallback
      // threshold keeps bounded-buffer typed aggregates hash-based. A
      // production session outside this config would silently plan
      // DIFFERENT (verified-nowhere) physical plans — the exact
      // injected-but-never-active divergence round 9 closed elsewhere.
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // stages whose generated method exceeds the JVM's 8 KB JIT
      // bytecode cap must FALL BACK (non-WSCG) instead of running
      // interpreted forever
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR") // reference log level (log4j.properties)
    s
  }

  def run(spark: SparkSession, inputPath: String, outputDir: String,
      countOnly: Boolean, planePath: Option[String], testFile: Option[String],
      saveModelDir: Option[String] = None): Unit = {

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

    saveModelDir.foreach { dir =>
      FlightModel.saveModels(dir, pipelineModel, result.model)
      println(s"[train] model saved to $dir")
    }

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
  private[apps] def sink(df: DataFrame, outputDir: String, name: String): Unit = {
    IO.writeParquet(df, s"$outputDir/$name.parquet")
    IO.writeSingleCsv(df, s"$outputDir/${name}_csv", s"$outputDir/$name.csv")
  }
}

/** Score-only lifecycle against a persisted model artifact:
  *
  *   ScoreApp <flights.csv[.bz2]> <modelDir> <outputDir> [--plane-data p]
  *
  * Loads the pipeline+tree saved by `TrainApp --save-model`, prepares the
  * input exactly as training did, scores, labels, and sinks — no fit
  * anywhere, so a scoring run touches only the input's own data. This is
  * the durable train-once/score-many lifecycle the reference approximates
  * in-memory (`/root/reference/src/main/main.py:170-260`). */
object ScoreApp {

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length >= 3,
      "usage: ScoreApp <input.csv> <modelDir> <outputDir> [--plane-data p]")
    val Array(inputPath, modelDir, outputDir) = positional.take(3)
    def optArg(flag: String): Option[String] = {
      val i = args.indexOf(flag); if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val spark = TrainApp.session("FlightDelayScoringApp")
    try run(spark, inputPath, modelDir, outputDir, optArg("--plane-data"))
    finally spark.stop()
  }

  def run(spark: SparkSession, inputPath: String, modelDir: String,
      outputDir: String, planePath: Option[String]): Unit = {
    val (pipelineModel, tree) = FlightModel.loadModels(spark, modelDir)
    val raw = IO.readCsv(spark, inputPath, Some(Schemas.flights))
    val plane = planePath
      .map(p => IO.readCsv(spark, p, Some(Schemas.planeData)))
      .getOrElse(graft.sources.FlightsGenerator.planeData(spark))
    val prepared = Prepare.prepareData(Cleaning.dropForbidden(raw), plane)
    val transformed = pipelineModel.transform(prepared)
    val scored = tree.map(_.transform(transformed)).getOrElse(transformed)
    val labeled = FlightModel.addLabels(scored)
    TrainApp.sink(labeled, outputDir, "scored")
    if (labeled.columns.contains("prediction") &&
        labeled.columns.contains(FlightModel.TargetCol))
      FlightModel.evaluate(labeled).foreach { case (mae, rmse) =>
        println(f"[score] MAE=$mae%.3f RMSE=$rmse%.3f")
      }
  }
}
