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

  test("geo_voyages: voyages partition each vessel's points") {
    val voy = GeoOps.queries("geo_voyages")(spark, SparkSpec.sf001)
      .collect()
    assert(voy.map(_.getLong(2)).sum == 10000L) // every point in exactly one voyage
    // voyage ids are 1..k consecutive per user
    voy.groupBy(_.getLong(0)).values.foreach { rs =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.toSeq == (1L to ids.length).toSeq)
    }
    // segmenting can only split tracks: total voyage km <= total track
    // km + tolerance is NOT an invariant (hops across gaps are
    // dropped), but each voyage's length is non-negative and finite.
    assert(voy.forall(r => r.getDouble(3) >= 0.0))
    // and the per-user voyage-km sum never exceeds the unsegmented
    // track length (dropping inter-voyage hops can only shorten).
    val track = GeoOps.queries("geo_track_length")(spark, SparkSpec.sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    voy.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      assert(rs.map(_.getDouble(3)).sum <= track(u) + 0.01)
    }
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
