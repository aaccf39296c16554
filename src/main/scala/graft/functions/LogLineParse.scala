package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass log-line classifier+extractor: the reference's entire
  * `ProcessQuery` dispatch (/root/reference/query.go:47-79) as ONE Catalyst
  * expression. Per line: severity substring prefilter, then the four
  * patterns tried in the reference's order (initial → stats → error →
  * memory), each behind its cheap literal-substring guard; first match
  * returns `struct(kind tinyint, groups array<string>)`, no match returns
  * null.
  *
  * This is the M7 upgrade over four separate regex columns: one virtual
  * call and at most one regex match for the common case, no intermediate
  * array columns, fully inside whole-stage codegen.
  * kind: 0=initial, 1=stats, 2=error, 3=memory.
  */
object LogLineParse {
  import graft.operators.LogParser.{ErrorRe, InitialRe, MemoryRe, StatsRe}

  final val KindInitial = 0
  final val KindStats = 1
  final val KindError = 2
  final val KindMemory = 3

  private case class Pat(kind: Int, guard: String, p: Pattern, n: Int)

  private lazy val pats: Array[Pat] = Array(
    Pat(KindInitial, "<Debug> executeQuery:", Pattern.compile(InitialRe), 7),
    Pat(KindStats, "<Information> executeQuery: Read", Pattern.compile(StatsRe), 8),
    Pat(KindError, "<Error> executeQuery: Code:", Pattern.compile(ErrorRe), 5),
    Pat(KindMemory, "MemoryTracker: Peak memory usage", Pattern.compile(MemoryRe), 4))

  /** Codegen/eval entry point. */
  def parse(s: UTF8String): InternalRow = {
    if (s == null) return null
    val line = s.toString
    // F1 severity prefilter (query.go:49-51)
    if (!(line.contains("Debug") || line.contains("Information") || line.contains("Error")))
      return null
    var i = 0
    while (i < pats.length) {
      val pat = pats(i)
      if (line.contains(pat.guard)) {
        val m = pat.p.matcher(line)
        if (m.find()) {
          val arr = new Array[Any](pat.n)
          var g = 0
          while (g < pat.n) {
            val v = m.group(g + 1)
            arr(g) = if (v == null) null else UTF8String.fromString(v)
            g += 1
          }
          return new GenericInternalRow(Array[Any](pat.kind, new GenericArrayData(arr)))
        }
      }
      i += 1
    }
    null
  }

  def log_line_parse(c: Column): Column = GraftColumns.of(LogLineParseExpr(GraftColumns.expr(c)))
}

case class LogLineParseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("kind", IntegerType, nullable = false),
    StructField("groups", ArrayType(StringType, containsNull = true), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "log_line_parse"

  override def nullSafeEval(input: Any): Any =
    LogLineParse.parse(input.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.LogLineParse.parse(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LogLineParseExpr =
    copy(child = newChild)
}
