package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Column <-> Catalyst Expression bridge for Spark 4's classic engine. */
object GraftColumns {
  def of(e: Expression): Column = Bridge.column(e)
  def expr(c: Column): Expression = Bridge.expression(c)
}
