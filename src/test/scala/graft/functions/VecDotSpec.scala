package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecDot (native codegen dot product) vs the composable HOF form —
  * they must be BIT-identical (same fold order, same double
  * arithmetic), since oracle hash-stability depends on it. */
class VecDotSpec extends SparkSpec {

  private def viaBoth(a: Seq[Float], b: Seq[Float]): (Double, Double) = {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.createDataFrame(Seq((a, b))).toDF("a", "b")
      .select(
        GraftFunctions.vecDot(col("a"), col("b")).as("native"),
        VectorOps.dot(col("a"), col("b")).as("hof"))
    val r = df.collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("native == HOF on a known vector pair") {
    val (n, h) = viaBoth(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
    assert(n == 32.0 && h == 32.0)
  }

  test("cosine of a vector with itself is 1") {
    GraftFunctions.ensureRegistered(spark)
    val ones = graft.Tables.embeddings(spark, SparkSpec.sf0001)
      .limit(50)
      .select(round(
        GraftFunctions.vecDot(col("embedding"), col("embedding"))
          / (sqrt(GraftFunctions.vecDot(col("embedding"), col("embedding")))
            * sqrt(GraftFunctions.vecDot(col("embedding"), col("embedding")))),
        4).as("c"))
      .collect().map(_.getDouble(0))
    assert(ones.forall(_ == 1.0))
  }

  test("property: native == HOF bit-for-bit on random float vectors") {
    val rng = new scala.util.Random(7)
    // Batch all 30 cases into ONE DataFrame pass (30 separate Spark
    // jobs would dominate test time).
    GraftFunctions.ensureRegistered(spark)
    val cases = Seq.fill(30)((
      Seq.fill(16)(rng.nextFloat() * 20f - 10f),
      Seq.fill(16)(rng.nextFloat() * 20f - 10f)))
    val rows = spark.createDataFrame(cases).toDF("a", "b")
      .select(
        GraftFunctions.vecDot(col("a"), col("b")).as("native"),
        VectorOps.dot(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double arrays (LSH plane dot)") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.createDataFrame(
        Seq((Seq(1f, 2f), Seq(0.5, -1.5)))).toDF("f", "d")
      .select(GraftFunctions.vecDot(col("f"), col("d")).as("x"))
    assert(df.collect()(0).getDouble(0) == 1.0 * 0.5 + 2.0 * -1.5)
  }

  test("interpreted path matches codegen path") {
    // eval() is exercised via filter on a literal (constant folding
    // runs interpreted); codegen via projection over a DataFrame.
    GraftFunctions.ensureRegistered(spark)
    val interpreted = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS x")
      .collect()(0).getDouble(0)
    assert(interpreted == 11.0)
  }
}
