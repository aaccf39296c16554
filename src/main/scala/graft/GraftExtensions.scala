package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{LogLineParseExpr, LongDotExpr, ParseBytes, RegexGroupsExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so plain `spark.sql` users get
  * `parse_bytes`, `regex_groups`, and `log_line_parse` (use with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // the keyless trailing-window theta-join escape hatch
    // (graft.plans.BucketedIntervalJoinRule): any inner join shaped
    // `r >= l - K AND r <= l` plans as a bucketed equi join instead of a
    // BroadcastNestedLoopJoin
    e.injectOptimizerRule(_ => graft.plans.BucketedIntervalJoinRule)

    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("parse_bytes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ParseBytes].getName, "parse_bytes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ParseBytes(exprs.head)))

    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("log_line_parse"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LogLineParseExpr].getName, "log_line_parse"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LogLineParseExpr(exprs.head)))

    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("long_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongDotExpr].getName, "long_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongDotExpr(exprs.head, exprs(1))))

    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("regex_groups"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RegexGroupsExpr].getName, "regex_groups"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val pattern = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"regex_groups pattern must be a string literal, got $other")
        }
        val n = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(i: Integer, _) => i.intValue()
          case other => throw new IllegalArgumentException(
            s"regex_groups group count must be an int literal, got $other")
        }
        RegexGroupsExpr(exprs.head, pattern, n)
      }))
  }
}
