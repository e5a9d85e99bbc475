package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies: array<string> → array<struct<term,cnt>>,
  * one entry per DISTINCT token, in first-occurrence order.
  *
  * This moves the TF half of TF-IDF out of the shuffle: the classic
  * explode→groupBy(doc,term) plan shuffles EVERY TOKEN OCCURRENCE to
  * count within a document, but a document's counts need no other row —
  * one local hash map per row does it. Downstream the exploded
  * (doc, term, cnt) stream is already distinct per (doc, term), so
  * document frequency is a plain count per term. q68's plan drops from
  * four data shuffles to two (df window by term, top-1 window by doc).
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TermCounts.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  /** Shared by interpreted eval and codegen. Clones each UTF8String —
    * the input array may be backed by reused unsafe-row memory. */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      // null elements are skipped, not counted: the declared output type
      // (term non-null) has no encoding for them, and a null token is
      // never a term
      val t = arr.getUTF8String(i)
      if (t != null) {
        val slot = counts.get(t)
        if (slot != null) slot(0) += 1L
        else counts.put(t.clone(), Array(1L))
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
