package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL registration for the native graft expressions, so `spark.sql`
  * users get the same fused kernels as the Column API:
  *
  *   cosine_similarity(a, b)          array<float> × array<float> → double
  *   vector_dot(a, b)                 array<float> × array<float> → double
  *   word_shingles(text, n)           string → array<string>
  *   minhash_signature(shingles, k)   array<string> → array<long>
  *   min_k_hashes(arr, k)             array<string> → array<long>
  *   simhash64(tokens)                array<string> → long
  *
  * Two paths: [[GraftExtensions]] for `spark.sql.extensions` at session
  * build time (the production route), [[GraftFunctions.registerAll]] for an
  * already-running session (tests, notebooks).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (args => CosineSimilarity(args(0), args(1))),
    "vector_dot" -> (args => DotProduct(args(0), args(1))),
    "word_shingles" -> (args => WordShingles(args(0), intArg(args(1), "n"))),
    "minhash_signature" -> (args => MinHashSignature(args(0), intArg(args(1), "k"))),
    "min_k_hashes" -> (args => MinKHashes(args(0), intArg(args(1), "k"))),
    "simhash64" -> (args => SimHash64(args(0))))

  /** Register every graft function on a live session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}

/** `spark.sql.extensions` entry point: injects the graft functions and
  * the grouped-top-k window rewrite at session construction. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        b))
    }
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}
