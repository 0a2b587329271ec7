package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge to the `private[sql]` Column ↔ Expression converters — the
 * standard pattern for Spark-extension libraries that ship custom
 * Catalyst expressions (Spark 4 no longer exposes a public
 * `Column(expr)` constructor).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a raw logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used by the view-substitution path, which
    * splices stored view definitions into a parsed statement plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Fork the session (`cloneSession` is `private[sql]`): copies
    * session state — temp views, conf, function registry, current
    * catalog — while sharing the SparkContext and SharedState. The
    * lock-free GraftSql routing runs each native statement on a clone
    * whose current catalog is the statement's warehouse. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()

  /** Copy a LOCAL temp view registered in `from` into `to` — the
    * per-statement-clone routing pattern: a CREATE TEMP VIEW executed
    * on a routing clone must survive into the caller's real session. */
  def copyTempView(from: SparkSession, to: SparkSession, name: String): Unit =
    from.sessionState.catalog.getRawTempView(name).foreach { v =>
      to.sessionState.catalog.createTempView(name, v,
        overrideIfExists = true)
    }

  /** Parse SQL text to an (unresolved) logical plan. */
  def parsePlan(spark: SparkSession, sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)
}
