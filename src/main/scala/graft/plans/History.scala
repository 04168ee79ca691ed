package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

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

  def defaultPath = "/root/repo/target/history.json"

  /** Stable key for (relation, filters): attribute ids stripped, conjunct
    * order normalized. `dataSize` (total bytes from the FileIndex) is a
    * data fingerprint: if the underlying files grow or shrink (history
    * recorded at sf0.01, reused at sf0.1), the key no longer matches and
    * the stale cardinality can never force-broadcast a now-large relation. */
  def scanKey(path: String, dataSize: Long, filters: Seq[Expression]): String =
    path + "#" + dataSize + "|" + exprKey(filters)

  /** Canonical text for an expression set: attribute ids stripped,
    * conjunct order normalized — shared by scan keys and join keys. */
  def exprKey(exprs: Seq[Expression]): String = exprs
    .map(_.transform { case a: AttributeReference => UnresolvedMarker(a.name) }.toString)
    .sorted.mkString(",")

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

  /** Execute the frame and record per-scan actual output rows. */
  def record(df: DataFrame): Unit = {
    df.count() // drive execution so metrics are populated
    recordPlan(df.queryExecution.executedPlan)
  }

  private def recordPlan(plan: SparkPlan): Unit = plan.foreach {
    case a: AdaptiveSparkPlanExec => recordPlan(a.executedPlan)
    case s: FileSourceScanExec =>
      val path = s.relation.location.rootPaths.map(_.toString).sorted.mkString(";")
      val rows = s.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      if (rows >= 0) store.put(scanKey(path, s.relation.location.sizeInBytes, s.dataFilters), rows)
    case _ => ()
  }

  def lookup(key: String): Option[Long] = store.get(key)
  def put(key: String, rows: Long): Unit = store.put(key, rows)
  def asMap: Map[String, Long] = store.toMap
  def size: Int = store.size
  def clear(): Unit = { store.clear(); loadedFrom = None }

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
    Files.createDirectories(p.getParent)
    Files.write(p, json.getBytes(StandardCharsets.UTF_8))
  }

  def load(path: String = defaultPath): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p) && loadedFrom != Some(path)) {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      // minimal parser for the flat {"k": n, ...} shape written by save()
      val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
      entry.findAllMatchIn(txt).foreach { m =>
        val k = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        store.put(k, m.group(2).toLong)
      }
      loadedFrom = Some(path)
    }
  }
}
