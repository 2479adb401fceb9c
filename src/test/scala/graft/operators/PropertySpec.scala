package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.ml.FlightModel

/** Property-based checks (SURVEY §5) on raw scalacheck generators (the
  * scalatest-scalacheck bridge isn't in the offline cache): trig identities
  * for the cyclical encodings, dedup idempotence, label totality, MinHash
  * estimate quality. Deterministic seeds. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("cyclical encodings satisfy sin²+cos²=1 for any non-null HHMM int") {
    val ts = samples(Gen.chooseNum(0, 2400), 20).distinct
    val enc = Features.cyclicalLocaltime(ts.toDF("DepTime"), "DepTime")
      .select(
        (pow(col("DepTime_minutes_sine"), 2) + pow(col("DepTime_minutes_cosine"), 2)).as("m"),
        (pow(col("DepTime_hours_sine"), 2) + pow(col("DepTime_hours_cosine"), 2)).as("h"))
      .collect()
    enc.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("dropDuplicates on the key is idempotent for random key lists") {
    samples(Gen.listOfN(30, Gen.chooseNum(1, 5)), 5).foreach { keys =>
      val df = keys.map(k => (k, s"v$k")).toDF("k", "v")
      val once = df.dropDuplicates(Seq("k"))
      assert(once.count() == once.dropDuplicates(Seq("k")).count())
      assert(once.count() == keys.distinct.size)
    }
  }

  test("label function is total over ints with exactly three labels") {
    val ds = samples(Gen.chooseNum(-10000, 10000), 40) ++ Seq(-10, -9, 9, 10, 0)
    val out = FlightModel.addLabels(ds.map(_.toDouble).toDF("prediction"))
      .select("prediction", "predicted_label").collect()
    out.foreach { r =>
      val d = r.getDouble(0)
      val expected = if (d >= 10) "delayed" else if (d <= -10) "early" else "on time"
      assert(r.getString(1) == expected)
    }
  }

  test("minhash similarity estimate tracks exact jaccard within tolerance") {
    val gen = for {
      base <- Gen.listOfN(40, Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty))
      keep <- Gen.chooseNum(10, 40)
    } yield (base.mkString(" "), base.take(keep).mkString(" "))
    samples(gen, 5).foreach { case (a, b) =>
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val pairs = Seq((1L, 2L)).toDF("id1", "id2")
      val exact = Dedup.ngramJaccard(pairs, docs, "doc_id", "text", 2)
        .first().getDouble(2)
      val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 128).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 128.0
      assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact a=$a b=$b")
    }
  }
}
