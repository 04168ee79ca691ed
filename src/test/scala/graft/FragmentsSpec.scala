package graft

import graft.plans.Fragments
import graft.queries.Tpch

/** Fragment-structure assertions over executed plans — the Spark
  * rendering of the reference's multi-fragment plan tests
  * (axiom/runner tests assert fragment counts/wiring; here the
  * exchange-delimited decomposition is asserted instead). */
class FragmentsSpec extends SparkSpec {

  test("q6 (scan+filter+agg) is two fragments joined by one shuffle") {
    val df = Tpch.q6(tables)
    df.collect() // finalize AQE
    val frags = Fragments.of(df)
    assert(frags.exists(_.kind == "root"))
    // single aggregation: exactly one shuffle boundary, no broadcast
    assert(frags.count(_.kind == "shuffle") == 1, Fragments.describe(df))
    assert(!frags.exists(_.kind == "broadcast"), Fragments.describe(df))
  }

  test("q3 wires broadcast fragments for the dimension side") {
    val df = Tpch.q3(tables)
    df.collect()
    val frags = Fragments.of(df)
    assert(frags.exists(_.kind == "broadcast"), Fragments.describe(df))
    val root = frags.find(_.kind == "root").get
    assert(root.children.nonEmpty)
    // every fragment id referenced as a child exists
    val ids = frags.map(_.id).toSet
    assert(frags.flatMap(_.children).forall(ids))
  }

  test("native as-of join clusters both sides: two shuffle fragments feed the merge") {
    val df = graft.queries.Events.asofNative(tables)
    df.collect()
    val frags = Fragments.of(df)
    assert(frags.count(_.kind == "shuffle") >= 2, Fragments.describe(df))
  }
}
