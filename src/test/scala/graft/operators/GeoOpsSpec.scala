package graft.operators

import graft.SparkSpec

/** Structural pins for the declared geo/transit queries (the oracle
  * hash-compare is the value-level gate; these catch shape breaks
  * early and document invariants). */
class GeoOpsSpec extends SparkSpec {

  test("geo_track_length: one row per vessel, points sum to events") {
    val rows = GeoOps.queries("geo_track_length")(spark, SparkSpec.sf001)
      .collect()
    assert(rows.length == 150) // one row per user_id in the fixture
    assert(rows.map(_.getLong(1)).sum == 10000L) // every event counted
    assert(rows.forall(_.getDouble(2) >= 0.0))
    // user_ids unique and sorted
    val ids = rows.map(_.getLong(0))
    assert(ids.toSeq == ids.sorted.toSeq && ids.distinct.length == ids.length)
  }

  test("geo_zone_counts: cells tile the globe, counts conserve events") {
    val rows = GeoOps.queries("geo_zone_counts")(spark, SparkSpec.sf001)
      .collect()
    // 30° cells over lat [-90,90) × lon [-180,180) = 6 × 12 = 72 max
    assert(rows.length <= 72)
    assert(rows.map(_.getLong(1)).sum == 10000L)
    rows.foreach { r =>
      val Array(la, lo) = r.getString(0).split(":").map(_.toLong)
      assert(la >= -3 && la <= 2, s"lat cell $la out of range")
      assert(lo >= -6 && lo <= 5, s"lon cell $lo out of range")
      assert(r.getLong(2) <= r.getLong(1)) // users <= events per zone
    }
  }
}
