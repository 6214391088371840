package org.apache.spark.sql

/**
 * Spark 4 removed the public `Column.expr` (Columns are ColumnNode-backed
 * since the Connect unification), so rendering a Column predicate to its SQL
 * text — needed to persist an execute-snapshot signal as a durable,
 * restart-parseable row (graft.cdc.CdcEngine.signalSnapshot) — requires the
 * `private[sql]` classic converter. This one-method bridge lives in the
 * org.apache.spark.sql package solely to reach it; nothing else leaks out.
 */
object ColumnSqlBridge {
  def sql(c: Column): String =
    classic.ColumnNodeToExpressionConverter.apply(c.node).sql
}
