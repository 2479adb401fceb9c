package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main: reference-scale (500k-row) training lifecycle —
  * the reference trains on 500k+ DOT flights (README.md:2,15); this runs
  * the same protocol on the seeded synthetic generator and reports
  * MAE/RMSE + wall time. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = args.headOption.map(_.toLong).getOrElse(500000L)
    val t0 = System.nanoTime()
    val flights = graft.sources.FlightsGenerator.flights(spark, rows, seed = 42L,
      tailPool = 4000)
    val plane = graft.sources.FlightsGenerator.planeData(spark, tailPool = 4000)
    val prepared = graft.operators.Prepare.prepareData(
      graft.operators.Cleaning.dropForbidden(flights), plane).cache()
    val nPrepared = prepared.count()
    val t1 = System.nanoTime()

    val pm = graft.ml.FlightPipeline().fit(prepared)
    val t2 = System.nanoTime()
    val result = graft.ml.FlightModel.trainModel(prepared, pm)
    val t3 = System.nanoTime()

    val preds = result.predictions.get
    val Some((mae, rmse)) = graft.ml.FlightModel.evaluate(preds)
    val labeled = graft.ml.FlightModel.addLabels(preds)
    val acc = labeled.filter(col("predicted_label") === col("actual_label")).count().toDouble /
      labeled.count()
    result.release()
    val t4 = System.nanoTime()

    println(f"[$rows] prepared_rows=$nPrepared prep=${(t1 - t0) / 1e9}%.1fs " +
      f"pipeline_fit=${(t2 - t1) / 1e9}%.1fs dt_train=${(t3 - t2) / 1e9}%.1fs " +
      f"eval=${(t4 - t3) / 1e9}%.1fs")
    println(f"[$rows] MAE=$mae%.3f RMSE=$rmse%.3f label_accuracy=$acc%.3f")
    result.model.foreach { m =>
      val imps = graft.ml.FlightModel.featureImportances(m, pm.transform(prepared.limit(1)))
      println(s"[$rows] top importances: " + imps.take(5).map {
        case (n, s) => f"$n=$s%.3f" }.mkString(", "))
    }
    spark.stop()
  }
}
