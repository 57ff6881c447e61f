package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Category J — user-defined function surface (SURVEY.md §2.1.J):
  * scalar UDF, typed Aggregator UDAF, and generator (UDTF analog).
  *
  * UDFs break whole-stage codegen, so the engine's rule is: built-ins
  * first (§G), UDx only for genuinely custom logic. These queries pin
  * the registration machinery; their arithmetic is mirrored inline in
  * the oracle SQL.
  */
object Udx {

  /** Scalar UDF: fare-band classifier over event value — stands in
    * for the domain UDFs (haversine etc.) an AIS pipeline registers. */
  val bandOf: Double => String = v =>
    if (v < 50) "low" else if (v < 120) "mid" else "high"

  /** Typed UDAF: weighted mean of `value` weighted by the JSON prop
    * `k` — a custom Aggregator with a (sum, weight) buffer, the
    * public-API equivalent of a TypedImperativeAggregate. */
  object WeightedMean extends Aggregator[(Double, Int), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Int)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    // Scalar UDF registration + use.
    "udf_scalar" -> ((s, d) => {
      val band = udf(bandOf)
      Tables.events(s, d)
        .withColumn("band", band(col("value")))
        .groupBy("event_type", "band")
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("total"))
        .orderBy("event_type", "band")
    }),

    // Typed Aggregator registered via functions.udaf.
    "udaf_typed" -> ((s, d) => {
      val wm = udaf(WeightedMean)
      Tables.events(s, d)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(round(wm(col("value"), col("k")), 4).as("wmean"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Generator / UDTF analog: per input row emit 1..l_linenumber rows.
    "udtf_generator" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(expr("sequence(1, l_linenumber)")).as("i"))
        .orderBy("l_orderkey", "l_linenumber", "i"))
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT event_type,
        | CASE WHEN value < 50 THEN 'low'
        |      WHEN value < 120 THEN 'mid' ELSE 'high' END AS band,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY event_type, band""".stripMargin,

    "udaf_typed" ->
      """SELECT event_type,
        | round(sum(value * k) / sum(k), 4) AS wmean, count(*) AS n
        |FROM (SELECT event_type, value,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "udtf_generator" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(unnest(generate_series(1, CAST(l_linenumber AS BIGINT)))
        |   AS INTEGER) AS i
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber, i""".stripMargin
  )
}
