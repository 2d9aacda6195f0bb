package graft

import graft.ingest.StagingReader
import graft.pipeline.Pipeline
import graft.serve.CacheManager
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The reference's serving query (§3.4) over a warehouse built by the
  * pipeline from fixture staging JSON. */
class CacheManagerSpec extends SparkSpec {

  private val json =
    """[
      |  {"artist_data": {"name": "Kermit Ruffins", "description": "Trumpet",
      |    "genres": ["Jazz", "Funk"],
      |    "related_artists": [{"name": "Rebirth Brass Band", "wwoz_artist_href": "/a/2"}],
      |    "wwoz_artist_href": "/a/1", "website": ""},
      |   "venue_data": {"name": "Blue Nile", "thoroughfare": "532 Frenchmen St",
      |    "phone_number": "", "locality": "New Orleans", "state": "LA",
      |    "postal_code": "70116", "full_address": "532 Frenchmen St, New Orleans, LA 70116",
      |    "is_active": true, "website": "", "wwoz_venue_href": "/v/1", "event_artist": ""},
      |   "event_data": {"event_date": "2025-03-21", "wwoz_event_href": "/e/1",
      |    "event_artist": "Kermit Ruffins", "wwoz_artist_href": "/a/1",
      |    "description": "Late set", "related_artists": [], "genres": ["Jazz"]},
      |   "performance_time": "2025-03-21T23:00:00+00:00",
      |   "scrape_time": "2025-03-20T03:00:00+00:00"},
      |  {"artist_data": {"name": "Tank and the Bangas", "description": "Soul",
      |    "genres": ["Funk"], "related_artists": [], "wwoz_artist_href": "/a/3",
      |    "website": ""},
      |   "venue_data": {"name": "Blue Nile", "thoroughfare": "532 Frenchmen St",
      |    "phone_number": "", "locality": "New Orleans", "state": "LA",
      |    "postal_code": "70116", "full_address": "532 Frenchmen St, New Orleans, LA 70116",
      |    "is_active": true, "website": "", "wwoz_venue_href": "/v/1", "event_artist": ""},
      |   "event_data": {"event_date": "2025-03-21", "wwoz_event_href": "/e/2",
      |    "event_artist": "Tank and the Bangas", "wwoz_artist_href": "/a/3",
      |    "description": "Early set", "related_artists": [], "genres": ["Funk"]},
      |   "performance_time": "2025-03-21T19:00:00+00:00",
      |   "scrape_time": "2025-03-20T03:00:00+00:00"}
      |]""".stripMargin

  private lazy val warehouse = {
    val dir = Files.createTempDirectory("graft-cm")
    Files.writeString(dir.resolve("staged.json"), json)
    Pipeline.run(spark, StagingReader.readStaged(spark, dir.toString),
      Pipeline.emptyWarehouse(spark), today = "2025-03-20")
  }

  test("J4 serving query: eager joins, time order, nested lists") {
    val rows = CacheManager.eventsByDate(warehouse, "2025-03-21").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("artist_name") == "Tank and the Bangas") // 19:00 first
    val kermit = rows(1)
    def seq(r: org.apache.spark.sql.Row, f: String): Seq[String] =
      r.getAs[scala.collection.Seq[String]](f).toSeq
    assert(seq(kermit, "artist_genres") == Seq("Funk", "Jazz"))
    assert(seq(kermit, "related_artists") == Seq("Rebirth Brass Band"))
    assert(seq(kermit, "event_genres") == Seq("Jazz"))
    assert(kermit.getAs[String]("full_address").startsWith("532 Frenchmen"))
  }

  test("C5/S7 cache payload: key, ordered JSON array, TTL tier") {
    val p = CacheManager.cachePayload(warehouse, "2025-03-21", "2025-03-20").head()
    assert(p.getAs[String]("cache_key") == "events:2025-03-21")
    assert(p.getAs[Long]("n_events") == 2L)
    assert(p.getAs[Long]("ttl_s") == 43200L) // tomorrow -> 12h tier
    val payload = p.getAs[String]("payload_json")
    assert(payload.startsWith("[{") && payload.endsWith("}]"))
    assert(payload.indexOf("Early set") < payload.indexOf("Late set")) // time order
  }

  test("S8 cache get/delete + the double-encoding quirk") {
    val cache = CacheManager.warmRange(warehouse,
      Seq("2025-03-21", "2025-03-22"), "2025-03-20")
    assert(CacheManager.cacheGet(cache, "2025-03-21").count() == 1)
    val afterDelete = CacheManager.cacheDelete(cache, Seq("2025-03-21"))
    assert(CacheManager.cacheGet(afterDelete, "2025-03-21").count() == 0)
    assert(afterDelete.count() == 1)

    // double-encoded payload: decoding ONE json layer yields the original
    val row = cache.withColumn("dbl",
      CacheManager.doubleEncodedPayload(col("payload_json")))
      .filter(col("cache_key") === "events:2025-03-21").head()
    val original = row.getAs[String]("payload_json")
    val doubled = row.getAs[String]("dbl")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readValue(doubled, classOf[String]) == original)
  }

  test("empty day still produces a cache row with n_events=0") {
    val p = CacheManager.cachePayload(warehouse, "2030-01-01", "2025-03-20").head()
    assert(p.getAs[Long]("n_events") == 0L)
    assert(p.getAs[String]("payload_json") == "[]")
    assert(p.getAs[Long]("ttl_s") == 86400L)
  }
}
