package graft

import org.apache.spark.sql.Dataset

case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String,
    l_linestatus: String, l_shipdate: java.sql.Timestamp)

/** Typed Dataset[T] surface: case-class Encoders, typed transforms,
  * groupByKey + typed aggregation — the compile-time-checked face of
  * the same engine (plans are identical to the DataFrame forms, so
  * nothing here needs its own oracle). */
class TypedSpec extends SparkSpec {

  private lazy val ds: Dataset[LineItem] = {
    val s = spark
    import s.implicits._
    Tables.lineitem(spark, SparkSpec.sf0001).as[LineItem]
  }

  test("typed filter/map matches untyped column form") {
    val s = spark
    import s.implicits._
    val typed = ds.filter(_.l_quantity > 45)
      .map(li => li.l_extendedprice * (1 - li.l_discount))
      .collect().sum
    val untyped = Tables.lineitem(spark, SparkSpec.sf0001)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 45)
      .selectExpr("sum(l_extendedprice * (1 - l_discount))")
      .collect()(0).getDouble(0)
    assert(math.abs(typed - untyped) < 1e-6)
  }

  test("groupByKey + typed agg matches groupBy") {
    val s = spark
    import s.implicits._
    val typed = ds.groupByKey(_.l_returnflag)
      .count().collect().toMap
    val untyped = Tables.lineitem(spark, SparkSpec.sf0001)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }

  test("typed schema round-trips through the encoder") {
    assert(ds.schema.fieldNames.toSeq ==
      Tables.lineitem(spark, SparkSpec.sf0001).schema.fieldNames.toSeq)
    val one = ds.head()
    assert(one.l_orderkey >= 0 && one.l_linenumber >= 1)
  }
}
