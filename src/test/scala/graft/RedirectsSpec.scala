package graft

import graft.graph.Redirects
import org.apache.spark.sql.functions._

/** Redirect-chain resolution: hop horizons under pointer doubling,
  * cycle/self-loop quarantine, convergent chains (many → one). */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveMap(edges: Seq[(Long, Long)], maxHops: Int)
      : Map[Long, (Option[Long], Boolean)] =
    Redirects.resolve(edges.toDF("src", "dst"), maxHops)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          r.getBoolean(2)))
      .toMap

  test("chains of every depth within the budget resolve to the terminal") {
    // 3 -> 2 -> 1 -> 0 (terminal), plus 10 -> 0 directly
    val m = resolveMap(Seq((3L, 2L), (2L, 1L), (1L, 0L), (10L, 0L)), 4)
    assert(m(3L) == (Some(0L), false))
    assert(m(2L) == (Some(0L), false))
    assert(m(1L) == (Some(0L), false))
    assert(m(10L) == (Some(0L), false))
  }

  test("self-loops and 2-cycles are unresolved with NULL final") {
    val m = resolveMap(Seq((5L, 5L), (7L, 8L), (8L, 7L), (9L, 7L)), 8)
    assert(m(5L) == (None, true))
    assert(m(7L) == (None, true))
    assert(m(8L) == (None, true))
    assert(m(9L) == (None, true)) // chain INTO a cycle: also quarantined
  }

  test("a chain deeper than the hop budget is unresolved, not mis-assigned") {
    val chain = (1L to 9L).map(i => (i, i - 1)) // 9 hops to reach 0
    val shallow = resolveMap(chain, 4)
    assert(shallow(9L)._2, "9-hop chain must not resolve under a 4-hop budget")
    val deep = resolveMap(chain, 16)
    assert(deep(9L) == (Some(0L), false))
  }

  test("non-power-of-two budgets are exact, not rounded up to the horizon") {
    // doubling with maxHops=5 runs 3 rounds (horizon 8); the walked-hop
    // column is what keeps 6..8-hop chains from resolving past the
    // stated budget
    val chain = (1L to 8L).map(i => (i, i - 1)) // depth of src i = i
    val m = resolveMap(chain, 5)
    (1L to 5L).foreach(i => assert(m(i) == (Some(0L), false), s"depth $i"))
    (6L to 8L).foreach(i => assert(m(i) == (None, true), s"depth $i"))
  }

  test("pointer doubling: a 2^k-hop chain resolves in k rounds (maxHops = 2^k)") {
    val chain = (1L to 8L).map(i => (i, i - 1))
    val m = resolveMap(chain, 8)
    (1L to 8L).foreach(i => assert(m(i) == (Some(0L), false), i.toString))
  }

  test("convergent fan-in: thousands of srcs onto one terminal, one answer") {
    val edges = (1L to 2000L).map(i => (i, 0L))
    val m = resolveMap(edges, 2)
    assert(m.size == 2000 && m.values.forall(_ == (Some(0L), false)))
  }
}
