package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase global ntile (Windows.scala `window_ntile`) must be
  * row-for-row identical to Spark's native `ntile(4)` — the rewrite
  * exists purely to kill the single-partition global window, never to
  * change semantics. Checked on a remainder-bearing fixture AND the
  * real customer table.
  */
class WindowsSpec extends SparkSpec {

  private def nativeNtile(dir: String) = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("bal_quartile"))
      .orderBy("c_custkey")
  }

  test("two-phase ntile == native ntile(4) on a fixture with" +
      " >=3 buckets and a remainder") {
    val s = spark
    import s.implicits._
    // 11 rows -> q=2, r=3: tile sizes 3,3,3,2 — the remainder split
    // is exactly what the integer arithmetic must reproduce. Values
    // span 5 floor-buckets including a negative one, with two rows
    // tying on floor(acctbal) (5.20/5.10) and one exact tie on
    // acctbal broken by custkey (3.50/3.50).
    val fixture = Seq(
      (1L, 5.20), (2L, 5.10), (3L, 3.50), (4L, 3.50), (5L, 2.75),
      (6L, 2.10), (7L, 0.99), (8L, 0.10), (9L, -0.50), (10L, -0.75),
      (11L, -999.99))
      .toDF("c_custkey", "c_acctbal")
      .withColumn("c_name", lit("x"))
      .withColumn("c_nationkey", lit(0))
      .withColumn("c_mktsegment", lit("y"))
    val dir = "/tmp/graft-test-ntile"
    fixture.write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val twoPhase = Windows.queries("window_ntile")(spark, dir).collect()
    val native = nativeNtile(dir).collect()
    assert(twoPhase.toSeq == native.toSeq)
    // Sanity: the remainder actually exercises both tile sizes.
    val sizes = twoPhase.groupBy(_.getInt(2)).view.mapValues(_.length)
    assert(sizes.values.toSet == Set(3, 2))
  }

  test("two-phase ntile == native ntile(4) on sf0.001 customer") {
    val twoPhase =
      Windows.queries("window_ntile")(spark, SparkSpec.sf0001).collect()
    val native = nativeNtile(SparkSpec.sf0001).collect()
    assert(twoPhase.toSeq == native.toSeq)
  }
}
