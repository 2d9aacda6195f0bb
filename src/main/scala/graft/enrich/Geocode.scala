package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5 — geocode enrichment (gcp_geocoding_service.py:29-89): venue
  * address → (lat, lon), with
  *  - default New Orleans coords (29.9511, -90.0715) for empty or
  *    `.Streaming` addresses and for lookup failures (defaults at
  *    gcp_geocoding_service.py:48-54);
  *  - a 30-day staleness gate: rows with a fresh `last_geocoded` are
  *    not re-looked-up (models.py:107-114, loader/service.py:543-552).
  *
  * The external API becomes a deterministic address-hash projection
  * (offline env), behind the same join shape a real service cache would
  * use: at scale this is one broadcast/shuffle join against a
  * `geocode_cache(address, lat, lon)` table plus a cheap computed
  * fallback — never a per-row RPC.
  */
object Geocode {

  val DefaultLat = 29.9511
  val DefaultLon = -90.0715
  val StalenessDays = 30

  /** Deterministic stand-in for the geocoding API: hash the address into
    * a ±0.05° offset around the default coords. */
  def fakeLookupLat(address: Column): Column =
    round(lit(DefaultLat) + (pmod(xxhash64(address), lit(10000L)) - 5000L) / 100000.0, 6)
  def fakeLookupLon(address: Column): Column =
    round(lit(DefaultLon) + (pmod(xxhash64(reverse(address)), lit(10000L)) - 5000L) / 100000.0, 6)

  private def needsDefault(address: Column): Column =
    address.isNull || length(trim(address)) === 0 || address.endsWith(".Streaming")

  /** Enrich `df` (must carry `addressCol`, `latitude`, `longitude`,
    * `last_geocoded`) in place:
    *  - fresh rows (geocoded within 30 days of `today`) keep their coords;
    *  - stale/missing rows first consult `cache(address, lat, lon)`
    *    (left join), then fall back to the deterministic lookup;
    *  - degenerate addresses always get the default coords. */
  def enrich(df: DataFrame, cache: DataFrame, addressCol: String,
             today: Column): DataFrame = {
    val fresh = col("last_geocoded").isNotNull &&
      datediff(today, to_date(col("last_geocoded"))) <= StalenessDays
    val addr = col(addressCol)
    val c = cache.select(col("address").as("_gc_addr"),
      col("lat").as("_gc_lat"), col("lon").as("_gc_lon"))
    df.join(broadcast(c), addr === col("_gc_addr"), "left")
      .withColumn("latitude",
        when(needsDefault(addr), lit(DefaultLat))
          .when(fresh, col("latitude"))
          .otherwise(coalesce(col("_gc_lat"), fakeLookupLat(addr))))
      .withColumn("longitude",
        when(needsDefault(addr), lit(DefaultLon))
          .when(fresh, col("longitude"))
          .otherwise(coalesce(col("_gc_lon"), fakeLookupLon(addr))))
      .withColumn("last_geocoded",
        when(fresh, col("last_geocoded")).otherwise(to_timestamp(today)))
      .drop("_gc_addr", "_gc_lat", "_gc_lon")
  }
}
