package graft.operators

import graft.SparkSpec

/** Approximate operators vs their exact twins: HLL distinct counts
  * must land within the documented error bound. */
class ApproxSpec extends SparkSpec {

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
