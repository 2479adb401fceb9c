package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Soundex: the independent golden implementation agrees with Spark's
  * native expression on the planted corpus AND on generated strings. */
class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  test("golden soundex equals Spark's native soundex on the corpus") {
    val native = Phonetic.corpusDF(spark)
      .select(col("name"), soundex(col("name")).as("code"))
      .as[(String, String)].collect().toMap
    Phonetic.plantedNames.foreach { n =>
      assert(native(n) == Phonetic.soundexGold(n), s"name $n")
    }
  }

  test("textbook codes: H/W continuation and same-block pairs") {
    assert(Phonetic.soundexGold("Robert") == "R163")
    assert(Phonetic.soundexGold("Rupert") == "R163")
    assert(Phonetic.soundexGold("Ashcraft") == "A261") // H does not split
    assert(Phonetic.soundexGold("Tymczak") == "T522")
    assert(Phonetic.soundexGold("Pfister") == "P236")
    assert(Phonetic.soundexGold("Honeyman") == "H555")
  }

  test("golden matches native on generated pseudo-names") {
    val gen = (1 to 200).map { i =>
      val rnd = new scala.util.Random(i)
      (1 to (4 + rnd.nextInt(8))).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString.capitalize
    }
    val native = gen.toDF("name")
      .select(col("name"), soundex(col("name")).as("code"))
      .as[(String, String)].collect().toMap
    gen.foreach(n => assert(native(n) == Phonetic.soundexGold(n), s"name $n"))
  }
}
