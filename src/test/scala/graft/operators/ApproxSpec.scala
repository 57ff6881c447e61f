package graft.operators

import graft.SparkSpec

/** Approximate operators vs their exact twins: HLL distinct counts
  * must land within the documented error bound. */
class ApproxSpec extends SparkSpec {

  test("approx_percentile brackets the exact median per returnflag") {
    val approx = Aggregates.queries("agg_approx_quantile")(
      spark, SparkSpec.sf001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Aggregates.queries("agg_median_quantile")(
      spark, SparkSpec.sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap // col 2 = p50
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, med) =>
      val (p50, p25, p75) = approx(k)
      // l_quantity is integers 1..50: the sketch's p50 must land
      // within one value of the exact median and inside [p25, p75]
      assert(math.abs(p50 - med) <= 1.0, s"$k: p50 $p50 vs exact $med")
      assert(p25 <= p50 && p50 <= p75, s"$k: quartiles disordered")
    }
  }

  test("approx_count_distinct within 5% of exact per event_type") {
    val approx = Aggregates.queries("agg_approx_distinct")(
      spark, SparkSpec.sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Aggregates.queries("agg_distinct")(
      spark, SparkSpec.sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05,
        s"$k: approx $ap vs exact $ex")
    }
  }
}
