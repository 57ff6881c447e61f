package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hash-threshold sampling discipline (round 9): membership is a
  * pure function of the row key, so the declared sampling queries are
  * oracle-checkable AND their realized rates must sit near the
  * threshold's designed probability. The Spark-seeded twins stay
  * engine-internal; their contract is double-run determinism only. */
class SamplingSpec extends SparkSpec {

  test("sample_fraction realizes ≈ the '19999'/16^5 threshold rate") {
    val total = graft.Tables.lineitem(spark, SparkSpec.sf001).count()
    val kept = Sampling.queries("sample_fraction")(
      spark, SparkSpec.sf001).count()
    val rate = kept.toDouble / total
    // designed p = 0x19999/16^5 = 0.0999994...; md5 is uniform enough
    // that sf0.01's ~60k rows land within ±10% relative.
    assert(rate > 0.09 && rate < 0.11, s"rate $rate off design 0.1")
  }

  test("sample_stratified realizes per-lang rates near 0.2/0.8") {
    val docs = graft.Tables.documents(spark, SparkSpec.sf001)
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("t"))
    val kept = Sampling.queries("sample_stratified")(spark, SparkSpec.sf001)
      .groupBy("lang").agg(count(lit(1)).as("k"))
    val rates = totals.join(kept, "lang")
      .select(col("lang"), (col("k") / col("t")).as("r")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.keySet.contains("en"))
    rates.foreach { case (lang, r) =>
      val design = if (lang == "en") 0.2 else 0.8
      // small strata (tens of docs per lang at sf0.01) → ±0.12
      assert(math.abs(r - design) < 0.12,
        s"$lang rate $r off design $design")
    }
  }

  test("hash sample is identical across runs AND input re-orderings") {
    val a = Sampling.queries("sample_fraction")(spark, SparkSpec.sf0001)
      .collect().toSeq
    val b = Sampling.queries("sample_fraction")(spark, SparkSpec.sf0001)
      .collect().toSeq
    assert(a == b)
    // membership survives an upstream repartition+sort scramble —
    // the property the seeded draw does NOT have
    val scrambled = graft.Tables.lineitem(spark, SparkSpec.sf0001)
      .repartition(7, col("l_partkey"))
      .filter(substring(md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"))), 1, 5) < "19999")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      .collect().toSeq
    assert(scrambled == a)
  }

  test("seeded twins are double-run deterministic (engine-internal)") {
    val f1 = Sampling.seededFraction(spark, SparkSpec.sf0001).collect().toSeq
    val f2 = Sampling.seededFraction(spark, SparkSpec.sf0001).collect().toSeq
    assert(f1 == f2)
    val s1 = Sampling.seededStratified(spark, SparkSpec.sf0001)
      .collect().toSeq
    val s2 = Sampling.seededStratified(spark, SparkSpec.sf0001)
      .collect().toSeq
    assert(s1 == s2)
  }
}
