package graft.serve

import graft.parse.Parsers
import graft.pipeline.Warehouse
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The cache-manager stage (SURVEY.md §3.4, cache_manager/service.py):
  * the serving query proper — events of one date, eagerly joined to
  * venue + artist + artist genres + related artists + event genres
  * (J4, no N+1), ordered by performance time (O1), re-nested to the DTO
  * JSON shape (A-agg4, P14) and keyed for the cache sink with a tiered
  * TTL (C5, S7).
  *
  * Plan shape at scale: the date predicate prunes a date-partitioned
  * fact; the four dim/edge joins broadcast (dims ≪ fact); the re-nest is
  * one groupBy on the fact key. One shuffle total.
  */
object CacheManager {

  /** J4/J6/O1 — per-event rows for `date` with everything eager-loaded. */
  def eventsByDate(w: Warehouse, date: String): DataFrame = {
    val dayEvents = w.events.filter(
      to_date(col("performance_time")) === to_date(lit(date)))

    val artistGenreNames = w.artistGenres
      .join(broadcast(w.genres.select(col("id").as("genre_id"),
        col("name").as("genre_name"))), "genre_id")
      .groupBy(col("artist_id"))
      .agg(sort_array(collect_list(col("genre_name"))).as("artist_genres"))

    val relatedNames = w.artistRelations
      .join(broadcast(w.artists.select(col("id").as("related_artist_id"),
        col("name").as("related_name"))), "related_artist_id")
      .groupBy(col("artist_id"))
      .agg(sort_array(collect_list(col("related_name"))).as("related_artists"))

    val eventGenreNames = w.eventGenres
      .join(broadcast(w.genres.select(col("id").as("genre_id"),
        col("name").as("genre_name"))), "genre_id")
      .groupBy(col("event_id"))
      .agg(sort_array(collect_list(col("genre_name"))).as("event_genres"))

    dayEvents.alias("e")
      .join(broadcast(w.venues.select(col("id").as("venue_id"),
        col("name").as("venue_full_name"), col("full_address"),
        col("latitude"), col("longitude"))), Seq("venue_id"), "left")
      .join(broadcast(artistGenreNames), Seq("artist_id"), "left")
      .join(broadcast(relatedNames), Seq("artist_id"), "left")
      .join(broadcast(eventGenreNames),
        col("e.id") === col("event_id"), "left")
      .select(col("e.id").as("event_id"), col("wwoz_event_href"),
        col("performance_time"), col("artist_name"), col("venue_name"),
        col("full_address"), col("latitude"), col("longitude"),
        col("e.description"),
        coalesce(col("artist_genres"), array()).as("artist_genres"),
        coalesce(col("related_artists"), array()).as("related_artists"),
        coalesce(col("event_genres"), array()).as("event_genres"))
      .orderBy(col("performance_time"), col("event_id"))
  }

  /** A-agg4/P14/C5/S7 — the cache payload: one row per date with the
    * day's events re-nested to JSON (ISO timestamps) plus the TTL. The
    * output table (cache_key, payload_json, ttl_s) is the engine-native
    * form of the Redis `SETEX events:{date} <json>` sink. */
  def cachePayload(w: Warehouse, date: String, today: String): DataFrame = {
    val rows = eventsByDate(w, date)
      .withColumn("performance_time_iso",
        date_format(col("performance_time"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .drop("performance_time")
    rows
      .withColumn("_doc", to_json(struct(rows.columns.sorted.map(col).toIndexedSeq: _*)))
      // deterministic array order: collect unordered (shuffle-safe), then
      // sort by (time, id) inside the aggregated array
      .agg(transform(
        array_sort(collect_list(struct(col("performance_time_iso"),
          col("event_id"), col("_doc")))),
        x => x.getField("_doc")).as("_docs"),
        count(lit(1)).as("n_events"))
      .withColumn("payload_json",
        concat(lit("["), concat_ws(",", col("_docs")), lit("]")))
      .select(
        concat(lit("events:"), lit(date)).as("cache_key"),
        col("payload_json"), col("n_events"),
        Parsers.ttlSeconds(to_date(lit(date)), to_date(lit(today))).as("ttl_s"))
  }

  /** A-agg3 — warm the cache for a date range; per-date counts. */
  def warmRange(w: Warehouse, dates: Seq[String], today: String): DataFrame =
    dates.map(d => cachePayload(w, d, today)).reduce(_ unionByName _)

  /** S8 — cache read-back: lookup by key on the cache output table. */
  def cacheGet(cacheTable: DataFrame, date: String): DataFrame =
    cacheTable.filter(col("cache_key") === s"events:$date")

  /** S8 — cache invalidation: delete-by-key (returns the surviving
    * table; at scale a partition-overwrite on the key column). */
  def cacheDelete(cacheTable: DataFrame, dates: Seq[String]): DataFrame =
    cacheTable.filter(!col("cache_key").isin(dates.map("events:" + _): _*))

  /** The reference's double-encoding quirk (SURVEY §2.1,
    * redis_cache.py:121-124,207): the JSON payload string is itself
    * JSON-encoded once more before storage, so the stored value is a
    * JSON string whose content is JSON. Reproduced byte-exact. */
  def doubleEncodedPayload(payload: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(payload, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))
}
