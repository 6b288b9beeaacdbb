package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column↔Expression converters — the one
  * sanctioned way to lift a custom Catalyst Expression into the public
  * Column API in Spark 4 (Column no longer exposes a public
  * Expression constructor).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the private[sql] state-store registry. A terminated
  * streaming query's providers stay loaded until the (default 60 s)
  * maintenance pass notices they're inactive; a harness draining many
  * short streaming queries through one session wants them unloaded
  * eagerly so later queries don't pay maintenance for earlier ones.
  */
object StateStoreShim {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
