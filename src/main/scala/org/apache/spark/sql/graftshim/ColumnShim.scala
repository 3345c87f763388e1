package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Column ⇄ Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), needed to
  * expose custom Catalyst expressions (e.g. `graft.functions.PorterStem`)
  * through the public Column API. Lives under `org.apache.spark.sql` only
  * for visibility — the standard technique for out-of-tree Catalyst
  * extensions; no Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
