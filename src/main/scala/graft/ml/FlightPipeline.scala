package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{OneHotEncoder, RobustScaler, StringIndexer, VectorAssembler}

import graft.operators.Features

/** M1-M6: the reference's 25-stage feature pipeline
  * (`/root/reference/src/main/helper_methods.py:252-278`), parameter-exact:
  *
  *  - per categorical: StringIndexer(handleInvalid=keep) → `<c>_index`,
  *    OneHotEncoder → `<c>_ONEHOT`
  *  - VectorAssembler(numeric, handleInvalid=skip) → `COMBINED_vec`
  *  - RobustScaler(withScaling=true, withCentering=false, 0.25/0.75)
  *    → `scaledFeatures`
  *  - VectorAssembler(ONEHOTs :+ scaledFeatures) → `features`
  *
  * All stages are Spark-ML built-ins; fit/transform run as distributed
  * Catalyst jobs (one distinct-count job per StringIndexer, one
  * quantile-summaries job for the scaler).
  */
object FlightPipeline {

  def apply(
      categoricalFeatures: Seq[String] = Features.totalCategoricalFeatures,
      numericFeatures: Seq[String] = Features.importantNumericFeatures): Pipeline = {

    val perCategorical = categoricalFeatures.flatMap { c =>
      val indexer = new StringIndexer()
        .setInputCol(c).setOutputCol(s"${c}_index")
        .setHandleInvalid("keep")
      val encoder = new OneHotEncoder()
        .setInputCols(Array(s"${c}_index")).setOutputCols(Array(s"${c}_ONEHOT"))
      Seq(indexer, encoder)
    }

    val numericAssembler = new VectorAssembler()
      .setInputCols(numericFeatures.toArray)
      .setOutputCol("COMBINED_vec")
      .setHandleInvalid("skip")

    val scaler = new RobustScaler()
      .setInputCol("COMBINED_vec").setOutputCol("scaledFeatures")
      .setWithScaling(true).setWithCentering(false)
      .setLower(0.25).setUpper(0.75)

    val finalAssembler = new VectorAssembler()
      .setInputCols((categoricalFeatures.map(c => s"${c}_ONEHOT") :+ "scaledFeatures").toArray)
      .setOutputCol("features")

    new Pipeline().setStages(
      (perCategorical ++ Seq(numericAssembler, scaler, finalAssembler)).toArray)
  }
}
