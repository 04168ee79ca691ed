package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, Exchange, ReusedExchangeExec, ShuffleExchangeLike}

/** Distributed-plan inspector: renders a physical plan as the
  * reference's MultiFragmentPlan of ExecutableFragments
  * (axiom/runner/MultiFragmentPlan.h:65-76 — fragments of operators wired
  * by exchanges, each fragment with its own parallelism). Spark's
  * execution model is the same shape — stages split at Exchange nodes —
  * but the boundary is implicit in the plan tree; this makes it explicit
  * so tests can assert "q3 runs as N fragments, M of them broadcast"
  * the way the reference asserts fragment structure in its plan tests.
  */
object Fragments {

  /** One exchange-delimited fragment. `kind` is "root", "shuffle" or
    * "broadcast" — how the fragment's OUTPUT reaches its consumer
    * (fragments below a shuffle produce shuffle writes; below a
    * broadcast, a broadcast table). */
  final case class Fragment(
      id: Int,
      kind: String,
      numOperators: Int,
      rootOperator: String,
      children: Seq[Int])

  /** Decompose an executed plan into fragments. AQE wrappers are
    * unwrapped to the current physical plan. */
  def of(df: DataFrame): Seq[Fragment] = {
    val out = Seq.newBuilder[Fragment]
    var nextId = 0

    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      // AQE materializes each fragment as a leaf QueryStageExec wrapping
      // the stage's real plan; reused exchanges point at the original.
      case q: QueryStageExec => unwrap(q.plan)
      case r: ReusedExchangeExec => unwrap(r.child)
      case other => other
    }

    def walk(root: SparkPlan, kind: String): Int = {
      val id = nextId
      nextId += 1
      var ops = 0
      val childIds = Seq.newBuilder[Int]

      def visit(p: SparkPlan): Unit = unwrap(p) match {
        case e: Exchange =>
          val k = e match {
            case _: ShuffleExchangeLike => "shuffle"
            case _: BroadcastExchangeLike => "broadcast"
            case _ => "exchange"
          }
          childIds += walk(e.child, k)
        case other =>
          ops += 1
          other.children.foreach(visit)
      }

      visit(root)
      out += Fragment(id, kind, ops, unwrap(root).nodeName, childIds.result())
      id
    }

    walk(df.queryExecution.executedPlan, "root")
    out.result().sortBy(_.id)
  }

  /** Compact one-line-per-fragment rendering, reference
    * MultiFragmentPlan::toString-style. */
  def describe(df: DataFrame): String =
    of(df).map { f =>
      val deps = if (f.children.isEmpty) "" else f.children.mkString(" <- [", ",", "]")
      s"F${f.id}(${f.kind}, ${f.numOperators} ops, root=${f.rootOperator})$deps"
    }.mkString("\n")
}
