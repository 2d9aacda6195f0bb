package graft.util

import scala.util.control.NonFatal

/** A6 — retry with backoff for EXTERNAL sinks only
  * (loader/service.py:862-902: 3 attempts, 0.1/0.25/0.55 s + jitter on
  * transient-classified errors).
  *
  * Inside Spark this is deliberately NOT used around shuffles/merges —
  * task retries (`spark.task.maxFailures`) plus idempotent merges replace
  * it (SURVEY §2.10). It exists for the connector boundary: a JDBC/KV
  * sink in `foreachPartition` where the framework can't retry a partial
  * external write safely.
  */
object Retry {

  /** The reference's transient-error classification
    * (loader/service.py:879-888). */
  def isTransient(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("").toLowerCase
    Seq("deadlock", "lock timeout", "timeout", "connection reset",
      "rollback", "temporarily unavailable").exists(m.contains)
  }

  def withBackoff[T](maxAttempts: Int = 3,
                     delaysMs: Seq[Long] = Seq(100L, 250L, 550L),
                     jitterMs: Long = 50L,
                     classify: Throwable => Boolean = isTransient,
                     sleep: Long => Unit = Thread.sleep,
                     // deterministic by default; a real caller passes Random
                     jitter: Long => Long = _ / 2)(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return f
      catch {
        // Fatal errors (OutOfMemoryError, InterruptedException, ...)
        // propagate immediately even if their message looks transient.
        case NonFatal(e) if classify(e) && attempt < maxAttempts - 1 =>
          last = e
          sleep(delaysMs.lift(attempt).getOrElse(delaysMs.last) + jitter(jitterMs))
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw last
  }
}

/** P15 — job-result envelope (helpers.py:132-153): the driver-side
  * response contract; not a relational op. */
case class JobResult(statusCode: Int, body: String,
    headers: Map[String, String] = Map("Content-Type" -> "application/json"))

object JobResult {
  def ok(body: String): JobResult = JobResult(200, body)
  def error(code: Int, message: String): JobResult =
    JobResult(code, s"""{"error": "$message"}""")
}
