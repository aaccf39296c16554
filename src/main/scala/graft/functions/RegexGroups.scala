package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-group regex extraction: `regex_groups(line, pat, n)`
  * returns `array<string>` of capture groups 1..n, or null when the pattern
  * does not match.
  *
  * Motivation: the reference matches each log line against a pattern ONCE and
  * reads all named groups from the single match (/root/reference/query.go:84-89).
  * Spark's builtin `regexp_extract` re-runs the regex per extracted group, so
  * a 7-group pattern would cost 7 matches per line. This expression restores
  * the one-pass behavior while staying inside whole-stage codegen.
  */
object RegexGroups {
  private val cache = new ConcurrentHashMap[String, Pattern]()

  /** Codegen/eval entry point. Returns null on non-match. */
  def extract(s: UTF8String, pattern: String, n: Int): ArrayData = {
    if (s == null) return null
    val p = cache.computeIfAbsent(pattern, (k: String) => Pattern.compile(k))
    val m = p.matcher(s.toString)
    if (!m.find()) return null
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) {
      val g = m.group(i + 1)
      arr(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(arr)
  }

  def regex_groups(c: Column, pattern: String, numGroups: Int): Column =
    GraftColumns.of(RegexGroupsExpr(GraftColumns.expr(c), pattern, numGroups))
}

case class RegexGroupsExpr(child: Expression, pattern: String, numGroups: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regex_groups"

  override def nullSafeEval(input: Any): Any =
    RegexGroups.extract(input.asInstanceOf[UTF8String], pattern, numGroups)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val patRef = ctx.addReferenceObj("pattern", pattern, "java.lang.String")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.RegexGroups.extract(${c.value}, $patRef, $numGroups);
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroupsExpr =
    copy(child = newChild)
}
