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

  test("geo_headings: modal sector valid, counts conserve hops") {
    import org.apache.spark.sql.functions._
    Seq(SparkSpec.sf001, SparkSpec.sf01).foreach { sf =>
      val ev = graft.Tables.events(spark, sf)
      val nUsers = ev.select("user_id").distinct().count()
      val nEvents = ev.count()
      val rows = GeoOps.queries("geo_headings")(spark, sf).collect()
      assert(rows.length == nUsers) // one modal row per vessel
      rows.foreach { r =>
        assert(r.getLong(1) >= 0 && r.getLong(1) <= 7) // 8 sectors
        assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3))
      }
      // hops = events − one first-point per vessel
      assert(rows.map(_.getLong(3)).sum == nEvents - nUsers)
    }
  }

  test("geo_speed_flags: no hop speed sits on the 500 km/h boundary") {
    // Same pattern as the other margin pins: the speed double crosses
    // engines only via the > 500 test; pin the minimum distance so a
    // fixture change landing a hop on the threshold is caught before
    // the oracle flakes. Contingency then: demote to no-oracle.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    Seq(SparkSpec.sf001, SparkSpec.sf01).foreach { sf =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val margin = graft.Tables.events(spark, sf)
        .withColumn("lat",
          (col("event_id") * 7919 % 18000) / 100.0 - 90.0)
        .withColumn("lon",
          (col("event_id") * 104729 % 36000) / 100.0 - 180.0)
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)))
        .withColumn("prev_lat", lag(col("lat"), 1).over(byUser))
        .withColumn("prev_lon", lag(col("lon"), 1).over(byUser))
        .filter(col("prev_lat").isNotNull && col("gap_us") > 0)
        .select(abs(graft.functions.Geo.haversineKm(col("prev_lat"),
          col("prev_lon"), col("lat"), col("lon"))
          / (col("gap_us") / 3.6e9) - 500.0).as("dist"))
        .agg(min("dist")).head.getDouble(0)
      info(f"min |speed − 500| at $sf: $margin%.3e km/h")
      assert(margin > 1e-6,
        f"a hop speed sits $margin%.3e km/h from the 500 km/h " +
          "threshold — cross-engine membership is no longer safe")
    }
  }

  test("geo_headings: no bearing sits on a 3-dp rounding tie") {
    // The sector binning rounds the bearing to 3 dp before floor, so
    // engines can only disagree if a raw bearing lands within the
    // cross-engine libm noise (~1e-10 after the ×1000 scale) of a
    // half-millidegree rounding tie (x.xxx5). Pin the minimum
    // distance at both t2 SFs — if a future fixture lands a bearing
    // on a tie, this fails before the oracle flakes. Contingency
    // then: demote geo_headings to no-oracle.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    Seq(SparkSpec.sf001, SparkSpec.sf01).foreach { sf =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val margin = graft.Tables.events(spark, sf)
        .withColumn("lat",
          (col("event_id") * 7919 % 18000) / 100.0 - 90.0)
        .withColumn("lon",
          (col("event_id") * 104729 % 36000) / 100.0 - 180.0)
        .withColumn("prev_lat", lag(col("lat"), 1).over(byUser))
        .withColumn("prev_lon", lag(col("lon"), 1).over(byUser))
        .filter(col("prev_lat").isNotNull)
        .select((graft.functions.Geo.bearingDeg(col("prev_lat"),
          col("prev_lon"), col("lat"), col("lon")) * 1000).as("t"))
        .select(abs(col("t") - floor(col("t")) - 0.5).as("dist"))
        .agg(min("dist")).head.getDouble(0)
      info(f"min distance to a rounding tie at $sf: $margin%.3e " +
        "millidegrees")
      assert(margin > 1e-7,
        f"a bearing sits $margin%.3e millidegrees from a 3-dp " +
          "rounding tie — cross-engine round() is no longer safe")
    }
  }
}
