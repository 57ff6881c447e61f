package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Language-ID heuristic on REAL multilingual fixtures (the testdata
  * corpus shares one vocabulary across langs, so quality can only be
  * asserted on embedded samples). */
class LangIdSpec extends SparkSpec {

  private val samples = Seq(
    (1L, "the cat sat on the mat and the dog barked", "en"),
    (2L, "der hund und die katze sind nicht im haus", "de"),
    (3L, "el perro que corre por los campos con una bola", "es"),
    (4L, "le chat est dans les jardins et le chien pour moi", "fr"))

  test("marker-word voting identifies the language of real samples") {
    val docs = spark.createDataFrame(samples).toDF("doc_id", "text", "lang")
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
    val profiles = spark.createDataFrame(LangId.profileRows)
      .toDF("w", "cand_lang", "weight")
    val best = toks.join(profiles, "w")
      .groupBy("doc_id", "lang", "cand_lang")
      .agg(sum("weight").as("score"))
      .groupBy("doc_id", "lang")
      .agg(max_by(col("cand_lang"),
        struct(col("score"), col("cand_lang"))).as("pred"))
      .collect()
    assert(best.length == samples.length)
    best.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: expected ${r.getString(1)}, got ${r.getString(2)}"))
  }

  test("script detection buckets CJK and Latin code points") {
    assert(LangId.scriptOf('中'.toInt) == "han")
    assert(LangId.scriptOf('a'.toInt) == "latin")
    assert(LangId.scriptOf('я'.toInt) == "cyrillic")
  }

  test("text_langid runs over the corpus and covers every doc") {
    val out = graft.operators.TextOps.queries("text_langid")(
      spark, SparkSpec.sf0001)
    assert(out.count() == 500)
  }
}
