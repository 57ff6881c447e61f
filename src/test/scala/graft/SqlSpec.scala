package graft

/** The SQL face: registerAll + spark.sql produce the same results as
  * the DataFrame face (they share one Catalyst pipeline). */
class SqlSpec extends SparkSpec {

  test("registerAll makes every table SQL-queryable") {
    Tables.registerAll(spark, SparkSpec.sf0001)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n")
        .collect()(0).getLong(0) > 0, s"table $n empty via SQL")
    }
  }

  test("SQL q1 == DataFrame agg_pricing_summary") {
    Tables.registerAll(spark, SparkSpec.sf0001)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(_.mkString("|")).toSeq
    val df = Tables.lineitem(spark, SparkSpec.sf0001)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.mkString("|")).toSeq
    assert(sql == df)
  }

  test("SQL sees the ns->us normalized events timestamps") {
    Tables.registerAll(spark, SparkSpec.sf0001)
    val mn = spark.sql("SELECT min(ts), max(ts) FROM events").collect()(0)
    assert(mn.getTimestamp(0).toString.startsWith("2024-01-01"))
    assert(mn.getTimestamp(1).toString.startsWith("2024-01-3"))
  }
}
