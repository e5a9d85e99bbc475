package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over ArrayType(FloatType) columns,
  * composed from codegen'd built-ins (zip_with/aggregate) — no UDFs.
  *
  * Determinism contract with the DuckDB oracles: elements are cast to
  * double BEFORE multiplication and summed by a sequential left fold,
  * the same evaluation order both engines use for list_reduce, so
  * results are bit-identical (floating point is order-sensitive).
  */
object VectorFunctions {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity, rounded to 8 dp (guards the last-ulp differences
    * fused operations could introduce on either engine). Native
    * expression ([[graft.functions.CosineSimilarity]]) — the HOF
    * spelling evaluates interpreted per element, which dominates LSH
    * candidate joins of millions of pairs. */
  def cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)

  /** HOF spelling, kept as the parity/reference implementation. */
  def cosineHof(a: Column, b: Column): Column =
    round(dot(a, b) / (norm2(a) * norm2(b)), 8)

  /** DuckDB spellings with identical fold order. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  def norm2Sql(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, " +
      s"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y))"

  /** Squared-L2 distance, rounded to 9 dp — mirrors the re-rank kernel in
    * [[graft.operators.PqIndex.searchRerank]] (`zip_with` diff² folded
    * left-to-right from 0.0) term-for-term so the two engines agree
    * bit-for-bit. */
  def l2Sql(a: String, b: String): String = {
    val d = s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))"
    s"round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), " +
      s"i -> $d * $d)), (x, y) -> x + y), 9)"
  }

  def cosineSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (${norm2Sql(a)} * ${norm2Sql(b)}), 8)"

  /** Random-hyperplane LSH bucket: sign bits of dot products with
    * `planes` fixed deterministic pseudo-vectors. Used to pre-bucket
    * ANN search so the 100 TB path joins within buckets instead of
    * brute-forcing the cross product. Plane p, dim i weight:
    * ((p * 1315423911 + i * 2654435761) % 1000003) / 1000003 - 0.5 */
  def lshBucket(vec: Column, planes: Int): Column =
    call_function("lsh_bucket", vec, lit(planes), lit(0))

  /** Band variant for multi-band LSH (embedding near-dup, q69): band
    * `b` uses the disjoint plane-index range [offset, offset+planes) of
    * the same deterministic plane family, so bands are independent. */
  def lshBucketBand(vec: Column, planes: Int, offset: Int): Column =
    call_function("lsh_bucket", vec, lit(planes), lit(offset))

  /** HOF spelling of [[lshBucketBand]] — the parity/reference
    * implementation the native expression is checked against
    * (VectorExpressionsSpec); `lshBucket(v, p) == lshBucketHof(v, p, 0)`. */
  def lshBucketHof(vec: Column, planes: Int, offset: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = (offset + p).toLong
      val proj = fold(zip_with(vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          (((lit(plane) * 1315423911L + i.cast("long") * 2654435761L) % 1000003L)
            .cast("double") / 1000003.0 - 0.5)))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Matrix-free Johnson–Lindenstrauss random projection: k dot
    * products against the SAME deterministic pseudo-plane family the
    * LSH buckets use (plane index range [offset, offset+k)), each
    * rounded to 8 dp for engine parity. No projection matrix is stored
    * or broadcast — weights derive from (plane, dim) arithmetic — so
    * the operator is pure per-row compute at any corpus size: the
    * standard cheap front-end to clustering/ANN when the raw dimension
    * is the cost driver. Native one-pass expression
    * ([[graft.functions.RandProject]]); the HOF spelling below is the
    * parity/reference implementation (interpreted per element — fine
    * for specs, not for a corpus scan). */
  def randProject(vec: Column, k: Int, offset: Int): Column =
    call_function("rand_project", vec, lit(k), lit(offset))

  /** HOF spelling of [[randProject]] — parity reference
    * (VectorExpressionsSpec pins native == HOF). */
  def randProjectHof(vec: Column, k: Int, offset: Int): Column =
    transform(sequence(lit(offset), lit(offset + k - 1)), p => {
      val proj = fold(zip_with(vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          (((p.cast("long") * 1315423911L + i.cast("long") * 2654435761L) % 1000003L)
            .cast("double") / 1000003.0 - 0.5)))
      round(proj, 8)
    })

  /** DuckDB spelling of [[randProject]] — identical fold order. */
  def randProjectSql(vec: String, k: Int, offset: Int): String =
    s"list_transform(generate_series($offset, ${offset + k - 1}), " +
      s"p -> round(list_reduce(list_prepend(0.0, " +
      s"list_transform(generate_series(1, len($vec)), " +
      s"i -> CAST($vec[i] AS DOUBLE) * " +
      s"(CAST((CAST(p AS BIGINT) * 1315423911 + CAST(i - 1 AS BIGINT) * 2654435761) % 1000003 AS DOUBLE) " +
      s"/ 1000003.0 - 0.5))), (x, y) -> x + y), 8))"

  def lshBucketBandSql(vec: String, planes: Int, offset: Int): String = {
    val bits = (0 until planes).map { p =>
      val plane = (offset + p).toLong
      val proj = s"list_reduce(list_prepend(0.0, list_transform(" +
        s"generate_series(1, len($vec)), i -> CAST($vec[i] AS DOUBLE) * " +
        s"(CAST((CAST($plane AS BIGINT) * 1315423911 + CAST(i - 1 AS BIGINT) * 2654435761) % 1000003 AS DOUBLE) " +
        s"/ 1000003.0 - 0.5))), (x, y) -> x + y)"
      s"CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  def lshBucketSql(vec: String, planes: Int): String = {
    val bits = (0 until planes).map { p =>
      val proj = s"list_reduce(list_prepend(0.0, list_transform(" +
        s"generate_series(1, len($vec)), i -> CAST($vec[i] AS DOUBLE) * " +
        s"(CAST((CAST($p AS BIGINT) * 1315423911 + CAST(i - 1 AS BIGINT) * 2654435761) % 1000003 AS DOUBLE) " +
        s"/ 1000003.0 - 0.5))), (x, y) -> x + y)"
      s"CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }
}
