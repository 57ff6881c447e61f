package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join equivalence: same result as the plain join, rows of a
  * hot key spread across salt buckets. */
class SkewSpec extends SparkSpec {

  test("salted join == plain join on a skewed fact table") {
    val s = spark
    import s.implicits._
    // skew: 90% of fact rows share key 1
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 10).toLong, i.toLong, s"p$i"))
      .toSeq.toDF("k", "row_id", "payload")
    val dim = (0L to 9L).map(k => (k, s"dim_$k")).toDF("k", "dim_name")

    val plain = fact.join(dim, "k")
      .select("row_id", "dim_name").orderBy("row_id")
      .collect().map(_.mkString("|")).toSeq
    val salted = Skew.saltedJoin(fact, dim, "k",
        saltFrom = "row_id", saltBuckets = 8)
      .select("row_id", "dim_name").orderBy("row_id")
      .collect().map(_.mkString("|")).toSeq
    assert(salted == plain)
  }

  test("hot key spreads across multiple salt buckets") {
    val s = spark
    import s.implicits._
    val fact = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val buckets = fact.withColumn("_salt",
        pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets >= 6, s"salt only hit $buckets of 8 buckets")
  }
}
