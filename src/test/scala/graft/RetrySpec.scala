package graft

import graft.util.{JobResult, Retry}
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("A6: transient errors retried with the reference's backoff ladder") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Retry.withBackoff(sleep = slept.append(_)) {
      calls += 1
      if (calls < 3) throw new RuntimeException("deadlock detected")
      42
    }
    assert(r == 42 && calls == 3)
    assert(slept.toSeq == Seq(125L, 275L)) // 100/250 + deterministic jitter
  }

  test("A6: non-transient errors fail fast; exhaustion rethrows") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withBackoff(sleep = _ => ()) {
        calls += 1; throw new IllegalStateException("schema mismatch")
      }
    }
    assert(calls == 1) // not classified as transient -> no retry
    intercept[RuntimeException] {
      Retry.withBackoff(sleep = _ => ()) {
        throw new RuntimeException("lock timeout")
      }
    }
  }

  test("A6: fatal errors propagate even when the message looks transient") {
    var calls = 0
    intercept[InterruptedException] { // fatal per NonFatal()
      Retry.withBackoff(sleep = _ => ()) {
        calls += 1; throw new InterruptedException("timeout waiting for lock")
      }
    }
    assert(calls == 1) // no retry, no swallowing
    intercept[OutOfMemoryError] {
      Retry.withBackoff(sleep = _ => ()) {
        throw new OutOfMemoryError("connection reset buffer")
      }
    }
  }

  test("P15: response envelope shapes") {
    assert(JobResult.ok("{}").statusCode == 200)
    assert(JobResult.error(500, "boom").body.contains("boom"))
  }
}
