package graft.plans

import graft.{Catalog, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fluent logical-plan builder — the Spark rendering of the reference's
  * primary API, logical_plan::PlanBuilder
  * (axiom/logical_plan/PlanBuilder.h:152-384: values/tableScan/filter/
  * project/map/with/aggregate/unnest/join/crossJoin/setOperation/sort/
  * limit/offset/tableWrite/as) with ExprApi-style expressions
  * (ExprApi.h:123-291) provided by Spark's own Column algebra plus the
  * Presto-name registry (graft.functions.Registry).
  *
  * Unlike the reference, which builds an IR that a separate optimizer
  * consumes, this builder composes `Dataset` transformations directly:
  * Catalyst IS the analyzer+optimizer (SURVEY §3.2 — "Spark is the
  * analyzer, no separate resolution pass needed"). Every method is
  * plan-declarative — nothing executes until the caller acts on
  * `build`.
  *
  * String expressions accept Spark SQL fragments (`expr(...)`), matching
  * PlanBuilder's SQL-string parsing entry (PlanBuilder.h:426 parse).
  */
final class PlanBuilder private (val df: DataFrame) {

  private def next(d: DataFrame) = new PlanBuilder(d)

  // ------------------------------------------------------------ shaping
  def filter(cond: Column): PlanBuilder = next(df.filter(cond))
  def filter(sql: String): PlanBuilder = next(df.filter(expr(sql)))

  /** Keep only the named projections (PlanBuilder.h:191 project). */
  def project(exprs: Column*): PlanBuilder = next(df.select(exprs: _*))
  def projectSql(exprs: String*): PlanBuilder = next(df.selectExpr(exprs: _*))

  /** Add/replace a computed column, keep the rest (PlanBuilder.h `with`). */
  def withCol(name: String, e: Column): PlanBuilder = next(df.withColumn(name, e))

  /** Rename the relation (correlation name, PlanBuilder.h:384 as). */
  def as(alias: String): PlanBuilder = next(df.as(alias))

  // ---------------------------------------------------------- aggregate
  /** Grouped aggregation; aggs must be named (PlanBuilder.h:237-260). */
  def aggregate(keys: Seq[Column], aggs: Seq[Column]): PlanBuilder =
    if (keys.isEmpty) next(df.agg(aggs.head, aggs.tail: _*))
    else next(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))

  def aggregateSql(keys: Seq[String], aggs: Seq[String]): PlanBuilder =
    aggregate(keys.map(col), aggs.map(expr))

  // -------------------------------------------------------------- joins
  def join(other: PlanBuilder, cond: Column, joinType: String = "inner"): PlanBuilder =
    next(df.join(other.df, cond, joinType))

  def crossJoin(other: PlanBuilder): PlanBuilder = next(df.crossJoin(other.df))

  // ------------------------------------------------------------- unnest
  /** Unnest an array column, optionally with 1-based ordinality,
    * replicating the remaining columns (LogicalPlanNode.h:571-657;
    * empty/null collections drop the row, matching the reference). */
  def unnest(arr: Column, as: String, withOrdinality: Boolean = false): PlanBuilder =
    if (withOrdinality)
      next(df.select(col("*"), posexplode(arr).as(Seq("pos", as)))
        .withColumn("ordinality", col("pos") + 1).drop("pos"))
    else next(df.select(col("*"), explode(arr).as(as)))

  /** Unnest a map column into key/value columns (LogicalPlanNode.h:576-580). */
  def unnestMap(m: Column, keyAs: String = "key", valueAs: String = "value"): PlanBuilder =
    next(df.select(col("*"), explode(m).as(Seq(keyAs, valueAs))))

  /** Unnest several arrays zipped together, null-padded to the longest
    * (LogicalPlanNode.h:581-585). Names must match the input columns. */
  def unnestZipped(arrs: Seq[Column]): PlanBuilder = {
    val zipped = df.select(col("*"), explode(arrays_zip(arrs: _*)).as("_z"))
    next(arrs.foldLeft(zipped) { (d, a) =>
      val n = a.toString
      d.withColumn(s"${n}_elem", col(s"_z.$n"))
    }.drop("_z"))
  }

  // ------------------------------------------------------------- window
  /** Windowed projection (Expr.h:526-612; the reference declares but
    * never plans windows — SURVEY §2.6: we exceed it). */
  def window(partitionBy: Seq[Column], orderBy: Seq[Column],
             exprs: (org.apache.spark.sql.expressions.WindowSpec => Column)*): PlanBuilder = {
    val spec = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    next(df.select(col("*") +: exprs.map(f => f(spec)): _*))
  }

  /** Grouping-sets aggregation (LogicalPlanNode.h:282-366). */
  def aggregateGroupingSets(sets: Seq[Seq[Column]], keys: Seq[Column],
                            aggs: Seq[Column]): PlanBuilder =
    next(df.groupingSets(sets, keys: _*).agg(aggs.head, aggs.tail: _*))

  // ---------------------------------------------------------- subqueries
  /** EXISTS filter (PlanBuilder.cpp:675 exists; QueryGraph.h:445-464
    * kLeftSemiFilter): keep rows for which `sub` returns at least one
    * row. Correlate by marking outer references inside `sub` with
    * `Column.outer()`. Catalyst's RewritePredicateSubquery lowers this
    * to the same left-semi join the subq_exists SQL entry plans. */
  def exists(sub: PlanBuilder): PlanBuilder = next(df.filter(sub.df.exists()))

  /** NOT EXISTS → anti join (QueryGraph.h kAnti). */
  def notExists(sub: PlanBuilder): PlanBuilder = next(df.filter(!sub.df.exists()))

  /** IN-subquery filter: `key IN (sub)` where `sub` produces a single
    * column, with SQL IN null semantics (NOT the EXISTS rewrite) —
    * lowers to the same semi join as the subq_in SQL entry. */
  def inSubquery(key: Column, sub: PlanBuilder): PlanBuilder =
    next(df.filter(key.isin(sub.df)))

  /** NOT IN (null-aware anti join, QueryGraph.h kAnti). */
  def notInSubquery(key: Column, sub: PlanBuilder): PlanBuilder =
    next(df.filter(!key.isin(sub.df)))

  // ------------------------------------------------------------- set ops
  def unionAll(others: PlanBuilder*): PlanBuilder =
    next(others.foldLeft(df)((acc, o) => acc.union(o.df)))
  def union(others: PlanBuilder*): PlanBuilder =
    next(others.foldLeft(df)((acc, o) => acc.union(o.df)).distinct())
  def intersect(other: PlanBuilder): PlanBuilder = next(df.intersect(other.df))
  def except(other: PlanBuilder): PlanBuilder = next(df.except(other.df))

  // ---------------------------------------------------------- sort/limit
  def sort(orders: Column*): PlanBuilder = next(df.orderBy(orders: _*))
  def sortSql(orders: String*): PlanBuilder =
    next(df.orderBy(orders.map(o => expr(o)): _*))
  def limit(n: Int): PlanBuilder = next(df.limit(n))
  def offset(n: Int): PlanBuilder = next(df.offset(n))

  // ----------------------------------------------------------- terminal
  /** Insert into a parquet table dir (TableWrite kInsert,
    * LogicalPlanNode.h:659-745); returns the written relation re-read. */
  def tableWrite(path: String): PlanBuilder = {
    df.write.mode("overwrite").parquet(path)
    next(df.sparkSession.read.parquet(path))
  }

  /** The composed logical plan as a DataFrame. */
  def build: DataFrame = df
}

object PlanBuilder {

  /** Typed per-aggregate modifiers — the builder surface for the
    * reference's AggregateExpr options (Expr.h:453-524 distinct /
    * filter / ordering; PlanBuilder.h:237-260 aggregate): wrap any
    * aggregate Column with DISTINCT, a per-row FILTER condition, and/or
    * an ORDER BY (order-sensitive aggregates such as listagg /
    * percentile_cont / mode). Compiles onto the underlying Catalyst
    * aggregate node — the same shape Spark's own `FILTER (WHERE …)` /
    * `DISTINCT` / `WITHIN GROUP` SQL produces — so partial aggregation
    * and codegen plan exactly as for native syntax. */
  def agg(e: Column, distinct: Boolean = false, filter: Option[Column] = None,
          orderBy: Seq[Column] = Nil): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, SupportsOrderingWithinGroup}
    import org.apache.spark.sql.graft.Shim
    val sortOrders = orderBy.map(c => Shim.expression(c) match {
      case s: SortOrder => s
      case other => SortOrder(other, Ascending)
    })
    // The argument must BE the aggregate call (modifiers attach to one
    // specific aggregate — wrap with round()/cast() OUTSIDE agg()). Only
    // the root node is rewritten: a tree-wide transform would also match
    // ordinary functions inside the filter/ordering expressions.
    val rewritten = Shim.expression(e) match {
      // Column-API functions arrive unresolved; SQL-built ones resolved.
      case f: UnresolvedFunction =>
        f.copy(isDistinct = distinct || f.isDistinct,
          filter = filter.map(Shim.expression).orElse(f.filter),
          orderingWithinGroup = if (sortOrders.nonEmpty) sortOrders else f.orderingWithinGroup)
      case ae: AggregateExpression =>
        val fn =
          if (sortOrders.isEmpty) ae.aggregateFunction
          else ae.aggregateFunction match {
            case o: SupportsOrderingWithinGroup => o.withOrderingWithinGroup(sortOrders)
            case other => throw new IllegalArgumentException(
              s"aggregate ${other.prettyName} is not order-sensitive " +
                "(ORDER BY applies to listagg/string_agg, mode, percentile_cont/disc)")
          }
        ae.copy(aggregateFunction = fn, isDistinct = distinct || ae.isDistinct,
          filter = filter.map(Shim.expression).orElse(ae.filter))
      case other => throw new IllegalArgumentException(
        s"PlanBuilder.agg() expects the aggregate call itself (e.g. sum(x)), got: $other")
    }
    Shim.column(rewritten)
  }

  /** ValuesNode (LogicalPlanNode.h:121-157). */
  def values(spark: SparkSession, schema: StructType, rows: Seq[Row]): PlanBuilder = {
    val list = new java.util.ArrayList[Row](rows.size)
    rows.foreach(list.add)
    new PlanBuilder(spark.createDataFrame(list, schema))
  }

  /** TableScan through the catalog (LogicalPlanNode.h:159-208), with
    * optional column pruning pushed into the scan. */
  def tableScan(t: Tables, name: String, columns: Seq[String] = Nil): PlanBuilder = {
    val base = t(name)
    new PlanBuilder(if (columns.isEmpty) base else base.select(columns.map(col): _*))
  }

  /** Wrap an arbitrary DataFrame (PlanBuilder.h:185 from). */
  def from(df: DataFrame): PlanBuilder = new PlanBuilder(df)

  /** Scalar subquery (lp::Subquery, PrestoParser.cpp:468; planned as a
    * single-row derived table, DerivedTable.cpp:182 findSingleRowDts):
    * the one-row/one-column plan as a Column usable inside any
    * expression — filters, projections, arithmetic.
    *
    * Limitation (Spark 4.1 DataFrame subquery API): `Column.outer()`
    * references do not resolve beneath an Aggregate inside `scalar()`,
    * so CORRELATED scalar subqueries stay on the SQL surface (the
    * subq_scalar_corr entry) — EXISTS/IN correlation works fine. */
  def scalarSubquery(sub: PlanBuilder): Column = sub.df.scalar()
}
