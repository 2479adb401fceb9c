package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. In Spark 4 the converters live in
  * `private[sql]` scope (`org.apache.spark.sql.classic.ExpressionUtils`),
  * so extension libraries that define native Catalyst expressions need a
  * shim inside an `org.apache.spark.sql` subpackage — the standard pattern
  * for Spark-native extension projects. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
