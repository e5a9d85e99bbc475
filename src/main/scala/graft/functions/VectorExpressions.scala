package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over float/double array columns.
  *
  * The HOF spelling (`zip_with` + `aggregate`) evaluates interpreted
  * per ELEMENT — over an LSH candidate join that is millions of pairs ×
  * vector dims of lambda dispatch (the same trap the text kernels hit,
  * see HashExpressions). One native expression evaluates the whole
  * vector pair in a tight loop.
  *
  * Exact parity with the HOF/DuckDB spelling: sequential left-fold
  * accumulation (i = 0..n-1) in double, then `round(x, 8)` with Spark's
  * HALF_UP BigDecimal semantics — bit-identical to the previous
  * `round(dot/(||a||·||b||), 8)` column and its DuckDB twin.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  private def elementOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects array<float|double>, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  // lazy: dataType may not be an ArrayType until analysis has run
  // checkInputDataTypes — an eager cast would CCE before the friendly error
  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute(" +
        s"$a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and codegen. */
  def compute(x: ArrayData, y: ArrayData,
      leftIsFloat: Boolean, rightIsFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    // norms run over each FULL vector (parity with norm2 of each side)
    i = 0
    while (i < x.numElements()) {
      val v = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      nx += v * v; i += 1
    }
    i = 0
    while (i < y.numElements()) {
      val v = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      ny += v * v; i += 1
    }
    val c = dot / (math.sqrt(nx) * math.sqrt(ny))
    // Spark round(x, 8) semantics (HALF_UP on the decimal rendering)
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) c
    else java.math.BigDecimal.valueOf(c)
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Native random-hyperplane LSH bucket — one pass over the vector for
  * all `planes` sign bits (the HOF spelling re-walks the vector per
  * plane, interpreted). Plane weights are the same deterministic family
  * as `VectorFunctions.lshBucket`/`lshBucketBand` and the DuckDB twins:
  * weight(plane, dim) = ((plane·1315423911 + dim·2654435761) mod 1000003)
  * / 1000003 − 0.5, accumulated in double, sign-tested per plane.
  */
case class HyperplaneBucket(child: Expression, planes: Int, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    HyperplaneBucket.compute(v.asInstanceOf[ArrayData], planes, offset, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucket.compute($c, $planes, $offset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, planes: Int, offset: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val plane = (offset + p).toLong
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x *
          (((plane * 1315423911L + i.toLong * 2654435761L) % 1000003L)
            .toDouble / 1000003.0 - 0.5)
        i += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Native JL random projection — k dot products against the
  * deterministic pseudo-plane family in ONE pass over the vector
  * (the HOF spelling re-walks the vector per plane, interpreted per
  * element). Same weight family as [[HyperplaneBucket]]; each
  * projection rounds to 8 dp with Spark's HALF_UP semantics, exactly
  * like `VectorFunctions.randProject` and its DuckDB twin.
  */
case class RandProject(child: Expression, k: Int, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rand_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rand_project expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    RandProject.compute(v.asInstanceOf[ArrayData], k, offset, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RandProject.compute($c, $k, $offset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandProject {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, k: Int, offset: Int, isFloat: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](k)
    var p = 0
    while (p < k) {
      val plane = (offset + p).toLong
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x *
          (((plane * 1315423911L + i.toLong * 2654435761L) % 1000003L)
            .toDouble / 1000003.0 - 0.5)
        i += 1
      }
      out(p) =
        if (java.lang.Double.isNaN(proj) || java.lang.Double.isInfinite(proj)) proj
        else java.math.BigDecimal.valueOf(proj)
          .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
