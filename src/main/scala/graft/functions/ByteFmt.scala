package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Humanized byte-size parser with cloudfoundry `bytefmt.ToBytes` semantics,
  * as used by the reference exporter (/root/reference/query.go:150-162,217-222):
  *
  *   - input is a mantissa + unit, e.g. "1.23GiB" (the caller strips inner
  *     whitespace first, mirroring `strings.Join(strings.Fields(x), "")`)
  *   - units are case-insensitive and ALL 1024-based ("KB" == "KiB" == 1024)
  *   - accepted suffixes: B, K/KB/KiB, M/MB/MiB, G/GB/GiB, T/TB/TiB,
  *     P/PB/PiB, E/EB/EiB
  *   - fractional mantissa allowed; result truncated toward zero (Go
  *     `uint64(value * multiplier)`)
  *   - negative values and anything not matching the grammar are errors
  *     (here: null, routed by the pipeline to the `convert` error counter).
  */
object ByteFmt {
  // Grammar of cloudfoundry bytefmt's ToBytes (public repo, bytes.go):
  // mantissa = everything before the first letter, fed to ParseFloat — so
  // optional sign, digits with optional fraction ("+5", ".5", "5." all
  // parse; "1e3" can't reach ParseFloat because 'e' is a letter); unit =
  // exactly one of the uppercased switch cases B | X | XB | XIB for
  // X∈{K,M,G,T,P,E} (bare "Ki"/"Mi" are NOT cases and are rejected).
  private val BytesRe: Pattern =
    Pattern.compile("(?i)^([+-]?(?:\\d+\\.?\\d*|\\.\\d+))([KMGTPE](?:I?B)?|B)$")

  private val Kib = 1024L

  def parse(s: String): java.lang.Long = {
    if (s == null) return null
    // mirror the reference's whitespace strip: "1.23 GiB" -> "1.23GiB"
    val compact = if (s.indexOf(' ') >= 0 || s.indexOf('\t') >= 0) {
      s.split("\\s+").mkString("")
    } else s
    val m = BytesRe.matcher(compact)
    if (!m.matches()) return null
    val value = java.lang.Double.parseDouble(m.group(1))
    if (value < 0) return null
    val mult = Character.toUpperCase(m.group(2).charAt(0)) match {
      case 'B' => 1L
      case 'K' => Kib
      case 'M' => Kib * Kib
      case 'G' => Kib * Kib * Kib
      case 'T' => Kib * Kib * Kib * Kib
      case 'P' => Kib * Kib * Kib * Kib * Kib
      case 'E' => Kib * Kib * Kib * Kib * Kib * Kib
    }
    java.lang.Long.valueOf((value * mult).toLong)
  }

  /** Codegen entry point (UTF8String in, boxed Long or null out). */
  def parseUTF8(s: UTF8String): java.lang.Long =
    if (s == null) null else parse(s.toString)

  def parse_bytes(c: Column): Column = GraftColumns.of(ParseBytes(GraftColumns.expr(c)))
}

/** `parse_bytes('1.23 GiB') = 1320702443L`. Native expression (not a UDF) so
  * it stays inside whole-stage codegen in the parse hot path.
  */
case class ParseBytes(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_bytes"

  override def nullSafeEval(input: Any): Any = {
    val r = ByteFmt.parseUTF8(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${c.isNull}) {
        java.lang.Long graft_pb_r = graft.functions.ByteFmt.parseUTF8(${c.value});
        if (graft_pb_r != null) { ${ev.isNull} = false; ${ev.value} = graft_pb_r.longValue(); }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseBytes =
    copy(child = newChild)
}
