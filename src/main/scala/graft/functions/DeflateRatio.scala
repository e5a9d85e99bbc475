package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length / text.length
  * (UTF-8 bytes), the cheap entropy proxy web-corpus pipelines use to
  * flag machine-generated/boilerplate pages (highly repetitive text
  * compresses far below prose) and binary-ish junk (ratio near or above
  * 1). Per-row codegen'd kernel — linear scan, no shuffle; a 100 TB
  * gate on this column is a filter pushed into the scan projection.
  *
  * Deterministic within a JVM/zlib build (fixed level + strategy, no
  * timestamps); NOT engine-portable — DuckDB has no deflate — so this
  * carries a property spec (ordering + bounds + determinism) instead of
  * a SQL oracle, like the other no-SQL-twin kernels.
  *
  * Reference analog: none (no quality gates in the reference); shape
  * follows the compression-heuristic filters described in public corpus
  * pipeline writeups (SURVEY §2.L12 family).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    DeflateRatio.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  /** Shared by interpreted eval and codegen. Empty input → 1.0 (nothing
    * to compress; neutral, never a divide-by-zero). */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
