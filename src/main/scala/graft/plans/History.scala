package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Execution-history store — the Spark rendering of the reference's
  * VeloxHistory (axiom/optimizer/VeloxHistory.h:44-50,
  * VeloxHistory.cpp:32-70: record per-node actuals from TaskStats after a
  * run, persist, and reuse them to cost future plans; persisted via
  * History::saveToFile, Cost.h:78-80).
  *
  * Keys are canonicalized (table path, pushed-filter set) pairs — the
  * analogue of the reference's canonical subplan history keys
  * (RelationOp.h:210-213 historyKey). Values are observed output rows.
  * [[HistoryStatsRule]] feeds them back as broadcast hints, which is the
  * Catalyst-idiomatic seam for cardinality feedback: Spark's static size
  * estimate for a filtered scan is the WHOLE file size, so a heavily
  * filtered dimension never broadcasts on its own below AQE visibility.
  */
object History {

  private val store = TrieMap.empty[String, Long]
  @volatile private var loadedFrom: Option[String] = None

  /** Every store mutation bumps this; the interpolation shape index
    * rebuilds lazily when it observes a new version. */
  private val storeVersion = new java.util.concurrent.atomic.AtomicLong(0L)
  private def putInternal(key: String, rows: Long): Unit = {
    store.put(key, rows)
    storeVersion.incrementAndGet()
  }

  def defaultPath = "/root/repo/target/history.json"

  /** Stable key for (relation, filters): attribute ids stripped, conjunct
    * order normalized. `dataSize` (total bytes from the FileIndex) is a
    * data fingerprint: if the underlying files grow or shrink (history
    * recorded at sf0.01, reused at sf0.1), the key no longer matches and
    * the stale cardinality can never force-broadcast a now-large relation. */
  def scanKey(path: String, dataSize: Long, filters: Seq[Expression]): String =
    path + "#" + dataSize + "|" + exprKey(filters)

  /** Canonical text for an expression set: attribute ids stripped,
    * conjunct order normalized, commutative equality orientation
    * normalized (so the logical `l.k = r.k` and the physical
    * EqualTo(leftKey, rightKey) reconstruction key identically) —
    * shared by scan keys and join keys. */
  def exprKey(exprs: Seq[Expression]): String = exprs
    .map(_.transform { case a: AttributeReference => UnresolvedMarker(a.name) }
      .transform { case EqualTo(a, b) if a.toString > b.toString => EqualTo(b, a) }
      .toString)
    .sorted.mkString(",")

  /** Conjunct split shared by the rule, the sampler, and actual-recording. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Placeholder leaf so two plans' equal-named columns key identically. */
  private case class UnresolvedMarker(name: String) extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
    override def nullable: Boolean = true
    override def dataType: org.apache.spark.sql.types.DataType = org.apache.spark.sql.types.NullType
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = null
    override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                     ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      throw new UnsupportedOperationException
    override def toString: String = s"col($name)"
  }

  /** Execute the frame and record per-subtree actual output rows. */
  def record(df: DataFrame): Unit = {
    df.count() // drive execution so metrics are populated
    recordPlan(df.queryExecution.executedPlan)
  }

  /** Record actuals from an already-executed query — the reference's
    * post-run history feedback (VeloxHistory::recordVeloxExecution,
    * VeloxHistory.cpp:32-70: per-node actual cardinalities from
    * TaskStats, reused to cost future plans). Both scans AND inner
    * equi-join subtrees are recorded, under the SAME canonical keys the
    * plan-time sampler writes — so a repeated workload plans from
    * actuals with sampling disabled, and sampling is only ever needed
    * for never-executed shapes.
    *
    * Executions containing any LIMIT-like node are NOT recorded: limits
    * early-terminate upstream pipelines (with a broadcast join the
    * probe-side scan, join, and limit share one codegen pipeline), so
    * every numOutputRows beneath them is truncated, not an actual.
    * This in particular excludes the plan-time join sampler's own
    * LocalLimit-capped probes — without the guard a huge table could be
    * recorded at the sampler's cap rows under the SAME canonical scan
    * key a real query uses and subsequently be hinted for broadcast.
    * (The async listener thread cannot consult Sampling.inProgress — a
    * ThreadLocal on the planning thread — so the guard is structural.)
    * Pure Sample executions stay recordable: Spark 4.1.2 does NOT push
    * filters through Sample (PushPredicateThroughNonJoin has no Sample
    * case), so the scan beneath a Sample carries no pushed filters and
    * records its exact TOTAL under the unfiltered key — a correct
    * value; the sampler's filtered probes therefore do not seed
    * filtered-key history (they don't need to: the probe itself returns
    * the estimate), and joins over sampled inputs never key (physKey is
    * undefined through Sample). */
  def recordExecution(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Offset, Tail}
    val truncating = qe.analyzed.exists {
      case _: LocalLimit | _: GlobalLimit | _: Offset | _: Tail => true
      case _ => false
    }
    if (!truncating) recordPlan(qe.executedPlan)
  }

  private def recordPlan(plan: SparkPlan): Unit =
    walk(plan) { p =>
      val rows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      if (rows >= 0) p match {
        case s: FileSourceScanExec => putInternal(physKey(s).get, rows)
        case j: BaseJoinExec => physKey(j).foreach(k => putInternal(k, rows))
        case _ => ()
      }
    }

  /** Physical-tree traversal that crosses the barriers `foreach` cannot:
    * AQE roots and materialized query stages are leaf-like wrappers. */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    kids.foreach(walk(_)(f))
  }

  /** Canonical history key of a PHYSICAL subtree, mirroring the logical
    * canonicalKey the planner rule builds: scans key on (path, data
    * fingerprint, pushed filters); inner equi joins compose their sides'
    * keys with the normalized join condition (equi conjuncts
    * reconstructed as EqualTo(leftKey, rightKey) — exprKey normalizes
    * the orientation). Exchanges, codegen wrappers, projections and
    * residual filters are transparent, as Project/Filter are on the
    * logical side. */
  private def physKey(p: SparkPlan): Option[String] = p match {
    case a: AdaptiveSparkPlanExec => physKey(a.executedPlan)
    case q: QueryStageExec => physKey(q.plan)
    case r: ReusedExchangeExec => physKey(r.child)
    case w: WholeStageCodegenExec => physKey(w.child)
    case i: InputAdapter => physKey(i.child)
    case e: ShuffleExchangeExec => physKey(e.child)
    case b: BroadcastExchangeExec => physKey(b.child)
    case r: AQEShuffleReadExec => physKey(r.child)
    case pr: ProjectExec => physKey(pr.child)
    case f: FilterExec => physKey(f.child)
    // Sorts and columnar transitions are physical artifacts of the
    // strategy choice, invisible on the logical side.
    case s: org.apache.spark.sql.execution.SortExec => physKey(s.child)
    case c: org.apache.spark.sql.execution.ColumnarToRowExec => physKey(c.child)
    case c: org.apache.spark.sql.execution.RowToColumnarExec => physKey(c.child)
    case s: FileSourceScanExec =>
      val path = s.relation.location.rootPaths.map(_.toString).sorted.mkString(";")
      // partitionFilters are part of the predicate the LOGICAL key is
      // built from (FileSourceStrategy splits one conjunct list into
      // partition/data halves) — omitting them recorded a partition-
      // pruned actual under the unpruned query's key, exactly the
      // stale-count force-broadcast the size fingerprint exists to
      // prevent (round-17 review). Runtime DPP filters are physical
      // artifacts with no logical twin: keying them would only create
      // dead entries, so they are dropped.
      val staticPart = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      Some(scanKey(path, s.relation.location.sizeInBytes, s.dataFilters ++ staticPart))
    case j: BaseJoinExec if j.joinType == Inner && j.leftKeys.nonEmpty =>
      val equi = j.leftKeys.zip(j.rightKeys).map { case (l, r) => EqualTo(l, r) }
      for (lk <- physKey(j.left); rk <- physKey(j.right))
        yield s"join[$lk * $rk | ${exprKey(equi ++ j.condition.toSeq.flatMap(conjuncts))}]"
    case _ => None
  }

  /** Interpolate a scan's output rows at an UNSEEN data size from
    * recorded operating points of the same shape — the reference's
    * sampled-point prediction model (axiom/optimizer/Model.h:17-100: "the
    * model predicts the value at an arbitrary point … based on the
    * measures of the neighboring points and the slope along each
    * dimension between the closest points on either side; if the point is
    * outside of the range … estimated according to the slope between the
    * two outermost values"), instantiated at rank 1: the shape is
    * (path, canonical filter set), the dimension is the data-size
    * fingerprint, the measure is observed rows.
    *
    * This closes the history gap the size fingerprint opens on purpose:
    * a workload re-run after the table grew misses every exact key (so a
    * stale count can never force-broadcast grown data), but with two or
    * more recorded sizes of the same shape the filter's selectivity trend
    * is known — predict along it instead of falling back to sampling or
    * static estimates. Extrapolation is broadcast-safe in the dangerous
    * direction: growing data extrapolates to MORE rows, making a
    * broadcast hint less likely, never more.
    */
  // Shape index backing interpolateScan: (path, filterKey) -> sorted
  // (dataSize, rows) points, rebuilt lazily on store-version change so
  // the optimizer rule pays one map lookup per miss instead of a full
  // store scan per filtered-scan node per plan compile.
  private val scanKeyRe = """^([^#]*)#(\d+)\|(.*)$""".r
  @volatile private var indexedVersion = -1L
  @volatile private var shapeIndex: Map[(String, String), IndexedSeq[(Long, Long)]] = Map.empty

  private def shapePoints(path: String, filterKey: String): IndexedSeq[(Long, Long)] = {
    val v = storeVersion.get
    if (indexedVersion != v) synchronized {
      if (indexedVersion != v) {
        // Join keys (`join[<key> * <key> | cond]`) also contain '#' and
        // '|' and would otherwise index as bogus scan shapes — scan keys
        // are only ever produced by scanKey, whose path never starts
        // with the join prefix.
        shapeIndex = store.toSeq
          .filterNot(_._1.startsWith("join["))
          .collect { case (scanKeyRe(p, sz, f), rows) => ((p, f), (sz.toLong, rows)) }
          .groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).toIndexedSeq }
        indexedVersion = v
      }
    }
    shapeIndex.getOrElse((path, filterKey), IndexedSeq.empty)
  }

  def interpolateScan(path: String, dataSize: Long, filters: Seq[Expression]): Option[Long] = {
    val pts = shapePoints(path, exprKey(filters))
    if (pts.size < 2) None
    else {
      val i = pts.indexWhere(_._1 >= dataSize)
      val (lo, hi) =
        if (i < 0) (pts(pts.size - 2), pts.last) // beyond largest: outermost slope
        else if (i == 0) (pts.head, pts(1)) // below smallest: innermost slope
        else (pts(i - 1), pts(i)) // bracketing points
      val slope = (hi._2 - lo._2).toDouble / (hi._1 - lo._1).toDouble
      val raw = math.max(0L, math.round(lo._2 + slope * (dataSize - lo._1).toDouble))
      // Beyond the largest recorded point, a negative outermost slope
      // (noisy / non-monotone history) would predict FEWER rows for
      // grown data and could force a broadcast of a now-large relation.
      // Clamp upward extrapolation to at least the largest recorded
      // rows so growth stays broadcast-safe in the dangerous direction.
      Some(if (i < 0) math.max(raw, pts.last._2) else raw)
    }
  }

  def lookup(key: String): Option[Long] = store.get(key)
  def put(key: String, rows: Long): Unit = putInternal(key, rows)
  def asMap: Map[String, Long] = store.toMap
  def size: Int = store.size
  def clear(): Unit = { store.clear(); storeVersion.incrementAndGet(); loadedFrom = None }

  /** Persist/load as JSON — cross-session history like the reference's
    * --history_save_path (TpchPlanTest.cpp:33-38). */
  def save(path: String = defaultPath): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val json = store.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ",", "}")
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_)) // bare filename: cwd
    Files.write(p, json.getBytes(StandardCharsets.UTF_8))
  }

  /** Optimizer-rule seam for cross-session history reuse: load the
    * persisted file only when the session OPTS IN — the reference's
    * history reuse is likewise flag-gated (--history_save_path,
    * TpchPlanTest.cpp:33-38). An ambient load here would leak one
    * flow's persisted cardinalities (e.g. a bench run's Analyze at
    * sf0.1) into every later session on the machine; the size
    * fingerprint keeps such strays inert for differently-sized data,
    * but sessions asserting exact store contents (specs) and flows
    * wanting a clean static-estimate baseline must stay unpolluted by
    * default. */
  def autoload(spark: org.apache.spark.sql.SparkSession): Unit =
    if (spark.conf.getOption("graft.history.autoload").contains("true")) {
      load()
      TableStats.load() // column stats travel with the row counts
    }

  def load(path: String = defaultPath): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p) && loadedFrom != Some(path)) {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      // minimal parser for the flat {"k": n, ...} shape written by save().
      // Single-pass unescape: replace() chains mis-decode a literal
      // backslash followed by 'uXXXX' text, and save()'s control-char
      // \uXXXX escapes need decoding too (round-17 review: a filter
      // literal with a newline never round-tripped).
      def unesc(s: String): String = {
        val b = new StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
            case 'u' if i + 5 < s.length =>
              b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => b += c; i += 2
          } else { b += s(i); i += 1 }
        }
        b.result()
      }
      val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
      entry.findAllMatchIn(txt).foreach { m =>
        putInternal(unesc(m.group(1)), m.group(2).toLong)
      }
      loadedFrom = Some(path)
    }
  }
}

/** Session hook feeding [[History]] from execution actuals — every
  * successful query's scan and join subtree cardinalities are recorded
  * when `graft.history.recordActuals` is true (default off, like the
  * reference's opt-in history flags, TpchPlanTest.cpp:33-38). Registered
  * session-wide via spark.sql.queryExecutionListeners in
  * graft.Sessions.builder; the gate is read per query so a session can
  * turn feedback on/off live. */
class HistoryListener extends org.apache.spark.sql.util.QueryExecutionListener {
  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
    if (qe.sparkSession.conf.get("graft.history.recordActuals", "false").toBoolean)
      History.recordExecution(qe)
  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
}
