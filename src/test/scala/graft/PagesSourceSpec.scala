package graft

import org.apache.spark.sql.functions._

class PagesSourceSpec extends SparkSpec {

  private def writeFixtures(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pages").toFile
    dir.deleteOnExit()
    Seq(
      "venues-v1" -> "<html><body>Venue One</body></html>",
      "venues-v2" -> "<html><body>Venue Two</body></html>",
      "artists-a1" -> "<html><body>Artist One</body></html>",
    ).foreach { case (name, html) =>
      java.nio.file.Files.writeString(
        new java.io.File(dir, s"$name.html").toPath, html)
    }
    dir
  }

  private def read(dir: java.io.File) =
    spark.read.format("graft.sources.PagesSource")
      .option("path", dir.getAbsolutePath).load()

  test("reads a page directory as raw_pages(url, html, fetched_at)") {
    val df = read(writeFixtures())
    assert(df.schema.fieldNames.toSeq == Seq("url", "html", "fetched_at"))
    val rows = df.orderBy("url").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("/artists-a1", "/venues-v1", "/venues-v2"))
    assert(rows(1).getString(1).contains("Venue One"))
    assert(rows.forall(_.getTimestamp(2) != null))
  }

  test("url filters prune the file list before partition planning") {
    val df = read(writeFixtures()).filter(col("url").startsWith("/venues-"))
    assert(df.rdd.getNumPartitions == 2) // only the 2 venue pages planned
    assert(df.count() == 2)
    val eq = read(writeFixtures()).filter(col("url") === "/venues-v2")
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.select("html").head().getString(0).contains("Venue Two"))
    // the pushed filter is visible in the scan description
    val plan = eq.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith") || plan.contains("EqualTo") ||
      plan.contains("pushedFilters"))
  }

  test("column pruning: projecting away html narrows the read schema") {
    val df = read(writeFixtures()).select("url")
    val scanSchemas = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanSchemas.contains("readSchema=[url]"),
      s"expected pruned readSchema in:\n$scanSchemas")
    assert(df.collect().length == 3)
  }

  test("feeds the extractor dataflow as the S1 connector") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pages2").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(
      new java.io.File(dir, "calendar.html").toPath,
      """<html><div class="livewire-listing"><div class="panel panel-default">
        |<div class="panel-title"><a href="/venues-v1">Venue One</a></div>
        |<div class="panel-body"><div class="row">
        |<div class="calendar-info"><a href="/events-e1">Artist One</a>
        |<p>8:00pm</p></div>
        |</div></div></div></div></html>""".stripMargin)
    val listings = read(dir)
      .withColumn("scrape_date", lit("2024-01-05"))
    val events = graft.extract.Extractor.eventsFromListings(listings)
    assert(events.count() == 1)
    assert(events.select("venue_href").head().getString(0) == "/venues-v1")
  }

  test("aggregate pushdown: COUNT(*)/MIN/MAX answered from metadata") {
    val dir = writeFixtures()
    val df = read(dir).agg(
      count(lit(1)).as("n"),
      min(col("fetched_at")).as("lo"), max(col("fetched_at")).as("hi"))
    val row = df.head()
    assert(row.getLong(0) == 3L)
    assert(!row.isNullAt(1) && !row.isNullAt(2))
    assert(!row.getTimestamp(1).after(row.getTimestamp(2)))
    // complete pushdown: the scan IS the aggregate answer (agg schema,
    // single partition), no per-file partitions planned
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggregates"), plan)
  }

  test("aggregate pushdown composes with a pushed url filter") {
    val df = read(writeFixtures())
      .filter(col("url").startsWith("/venues-"))
      .agg(count(lit(1)))
    assert(df.head().getLong(0) == 2L)
    assert(df.queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
  }

  test("aggregate pushdown refused when a residual filter remains") {
    // html filter is NOT pushable: the source must refuse the aggregate
    // (a metadata count would ignore the post-filter and overcount)
    val df = read(writeFixtures())
      .filter(col("html").contains("Venue"))
      .agg(count(lit(1)))
    assert(df.head().getLong(0) == 2L)
    assert(!df.queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
  }
}
