package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Spark 4's Column is ColumnNode-backed (Connect unification), so building a
 * Column from a raw Catalyst Expression — needed to plant the wire-codec
 * expressions (graft.formats.AvroWire/ProtoWire) directly into a projection —
 * goes through the `private[sql]` classic converters. Same pattern as
 * [[ColumnSqlBridge]]: this two-method bridge lives in the
 * org.apache.spark.sql package solely to reach them; nothing else leaks out.
 */
object ExprColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
