package graft

/** End-to-end smoke over the real sf0.001 testdata: every declared query
  * runs and returns rows (the driver's t1 gate shape). */
class EntrySmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name should return rows: ") { assert(n > 0) }
    }
  }
}
