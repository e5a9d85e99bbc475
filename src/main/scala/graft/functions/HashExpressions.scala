package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash kernels for the text-dedup family.
  *
  * The composed higher-order-function forms (TextFunctions) are exact but
  * interpreted per element — a per-character closure call. These
  * expressions compute the identical arithmetic in tight JVM loops
  * (PolyHash additionally participates in whole-stage codegen), which is
  * what makes MinHash/SimHash viable at 100 TB. Semantics are pinned to
  * the DuckDB oracle spellings in TextFunctions.*Sql: polynomial fold
  * over unicode code points, (acc * 31 + cp) % 1000000007.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object PolyHash {
  final val Prime = 1000000007L

  /** Fold over code points — matches DuckDB `ascii(c)` per char. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Distinct k-token-window shingle hashes from a token array, one pass:
  * tokens → PolyHash per token → sliding-window combine
  * fold (acc * combine + h(i+j)) % P (missing tokens → 0, matching the
  * coalesce in the composed/oracle form). A composed HOF version is
  * O(tokens²) per row because `element_at(tokenHashes, i+j)` re-derives
  * the whole hash array for every window. */
case class ShingleHashes(child: Expression, k: Int, combine: Long,
    dedupe: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (dedupe) "shingle_hashes" else "shingle_hashes_pos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[ArrayData], k, combine, dedupe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $k, ${combine}L, $dedupe)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared by interpreted eval and codegen. `dedupe=false` keeps one
    * hash per window POSITION in order (duplicates included) — the form
    * positional consumers (winnowing) need; `dedupe=true` is the
    * set-semantics form MinHash/containment consume. */
  def compute(arr: ArrayData, k: Int, combine: Long,
      dedupe: Boolean = true): GenericArrayData = {
    val n = arr.numElements()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = PolyHash.hash(arr.getUTF8String(i).toString)
      i += 1
    }
    val windows = math.max(n - k + 1, 1)
    val raw = new Array[Long](windows)
    i = 0
    while (i < windows) {
      var acc = 0L
      var j = 0
      while (j < k) {
        val h = if (i + j < n) hashes(i + j) else 0L
        acc = (acc * combine + h) % PolyHash.Prime
        j += 1
      }
      raw(i) = acc
      i += 1
    }
    if (!dedupe) return new GenericArrayData(raw)
    val seen = new java.util.LinkedHashSet[java.lang.Long](windows * 2)
    i = 0
    while (i < windows) { seen.add(raw(i)); i += 1 }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm): over a positional hash
  * array, take the minimum of every w-length sliding window and return
  * the DISTINCT selected values in first-occurrence order. Guarantee:
  * any two documents sharing a token run long enough to span one full
  * window (w + shingleK - 1 tokens) share at least one fingerprint,
  * while only ~2/(w+1) of all shingle hashes are kept.
  *
  * Monotone-deque sliding minimum — O(n) per row regardless of w; the
  * composed HOF spelling (array_min over per-window slices) is O(n·w)
  * with a slice allocation per window. Reference has no analog
  * (SURVEY §2.L14 family).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (w >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("winnow_select: w must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowSelect.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  /** Shared by interpreted eval and codegen. Windows shorter than w
    * (n < w) collapse to one whole-array window, matching
    * generate_series(1, greatest(n - w + 1, 1)) + clamped slice in the
    * oracle spelling. */
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = arr.getLong(i); i += 1 }
    val windows = math.max(n - w + 1, 1)
    // monotone deque of indices; head = index of current window minimum
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.LinkedHashSet[java.lang.Long](windows * 2)
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1 || i == n - 1) seen.add(h(dq(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature over a bigint hash array: for lane i,
  * min over h of (h * a_i + b_i) % P, with (a_i, b_i) from
  * TextFunctions.minhashParams. Tight loop, no per-element closures. */
case class MinHashArray(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_array expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashArray.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashArray.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashArray {
  // (a_i, b_i) lane parameters memoized per lane count: deterministic,
  // computed once per JVM instead of per row (codegen calls are static)
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def paramsFor(numHashes: Int): Array[(Long, Long)] =
    paramCache.computeIfAbsent(numHashes,
      n => TextFunctions.minhashParams(n).toArray)

  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val params = paramsFor(numHashes)
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val (a, b) = params(i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        val v2 = (h * a + b) % PolyHash.Prime
        if (v2 < min) min = v2
        j += 1
      }
      out(i) = if (n == 0) 0L else min
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 32-bit SimHash over a bigint token-hash array (same semantics as
  * TextFunctions.simhash / simhashSql): per bit b, sum (+1/-1) of bit b
  * over all hashes; bit set iff sum > 0. */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashBits.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashBits.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object SimHashBits {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](TextFunctions.SimHashBits)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < counts.length) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < counts.length) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Merge-count of common elements between two ASCENDING-sorted
  * array<bigint> columns — the verification kernel of the
  * prefix-filtered containment join (ContainmentDedup). Equivalent to
  * `size(array_intersect(a, b))` on duplicate-free sorted inputs, but a
  * single allocation-free two-pointer pass in whole-stage codegen where
  * array_intersect builds a hash set per row (measured 10× on the
  * 5M-candidate verify stage at sf0.1). Inputs MUST be sorted ascending
  * and duplicate-free (shingle_hashes output is; apply sort_array
  * otherwise) — unsorted input silently undercounts.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Shared by interpreted eval and codegen: classic two-pointer merge. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Membership probe of a bigint column against a pre-built Spark
  * [[org.apache.spark.util.sketch.BloomFilter]], carried as serialized
  * bytes (a foldable binary literal through the SQL registration; see
  * GraftFunctions). The filter deserializes ONCE per executor
  * (@transient lazy) and the probe participates in whole-stage codegen —
  * the map-side prefilter of the cross-corpus dedup path
  * (operators.BloomDedup): "definitely new" rows never reach a join.
  * May return true for absent values (the filter's fpp); never false
  * for present ones — callers must treat `true` as "verify exactly".
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${other.simpleString}")
  }

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
