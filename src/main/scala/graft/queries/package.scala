package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query inventory.
  *
  * Oracle-parity conventions (see SURVEY.md §7.4 "Result hashing"):
  *  - every query ends in a deterministic ORDER BY (unique tie-break);
  *  - double-typed SUMs go through DECIMAL(18,2) so both engines do
  *    exact, order-independent arithmetic, then cast to DOUBLE;
  *  - AVG is expressed as decimal-sum / count (both sides identical);
  *  - column aliases match the oracle SQL exactly;
  *  - `round(num/den, 6)` over an integer ratio is UNSAFE when the
  *    denominator can carry 2^7 of powers of two: the ratio can land
  *    exactly on .5e-6 (e.g. 1043/16000 = 0.0651875) where Spark's
  *    HALF_UP and DuckDB's double rounding disagree. Round in integer
  *    space instead — `(2*num*1000000 + den) div (2*den)` (half away
  *    from zero; prepend sign(num) when num can be negative), then cast
  *    to double / 1e6. Denominators <= ~60 (per-doc token counts) can't
  *    tie and may keep plain round(). See q68/q87/q92/q99.
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.table(name)
  }

  /** Exact decimal view of a double column (order-independent sums). */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent SUM of a double column, rendered as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent AVG of a double column, rendered as double. */
  def davg(c: Column): Column = (sum(dec(c)).cast("double") / count(c))

  /** Revenue-style SUM(a * (1 - b)) computed entirely in exact decimal.
    * Casting the double *product* to decimal diverges between engines at
    * .xx5 ties (Spark HALF_UP vs DuckDB half-even); casting the 2-dp
    * *operands* first is tie-free, and the decimal multiply/sum is exact.
    */
  def dsumRev(price: Column, disc: Column): Column =
    sum(dec(price) * (lit(1).cast("decimal(18,2)") - dec(disc))).cast("double")

  /** 6-dp HALF-UP rounding of a NON-NEGATIVE integer ratio num/den in
    * pure 64-bit integer arithmetic: (num*2e6 + den) div (den*2), then
    * the rounded integer renders as the same double in both engines.
    * Operands are cast to long BEFORE the scaling multiply (a 32-bit
    * product would wrap first — pass pre-multiplied terms as longs).
    * Headroom: num < ~4.6e12. Spelled once here + [[oRound6]] so the
    * Spark and oracle sides cannot drift. */
  def round6(num: Column, den: Column): Column = {
    val n = num.cast("long"); val d = den.cast("long")
    call_function("div", n * lit(2000000L) + d, d * lit(2L))
      .cast("double") / 1000000.0
  }

  /** [[round6]] for possibly-negative numerators: half AWAY FROM ZERO
    * (what Spark's round/HALF_UP does), den still positive. */
  def round6Signed(num: Column, den: Column): Column =
    signum(num).cast("double") * round6(abs(num), den)

  /** Overflow-guarded int64 product: the rational oracle-parity scorers
    * (q116/q117) are exact only while their integer products fit int64 —
    * DuckDB widens to HUGEINT where Spark's BIGINT silently wraps, so a
    * wrap would surface as a quiet oracle mismatch (or worse, a quietly
    * wrong ranking in production). This makes the headroom bound a LOUD
    * per-row error at negligible cost (two codegen'd ops, no extra job).
    * Operands may be any int64 (guard uses |a| > Max/|b|). */
  def mulGuard(a: Column, b: Column, what: String): Column = {
    val wraps = b =!= 0L &&
      abs(a) > lit(Long.MaxValue) / abs(b)
    when(wraps, raise_error(concat(
      lit(s"int64 overflow in $what: "), a.cast("string"), lit(" * "),
      b.cast("string"),
      lit(" — corpus exceeds the rational scorer's headroom; use the double-scorer path")))
      .cast("long"))
      .otherwise(a * b)
  }

  def oRound6(num: String, den: String): String =
    s"CAST((($num) * 2000000 + ($den)) // (($den) * 2) AS DOUBLE) / 1000000.0"

  def oRound6Signed(num: String, den: String): String =
    s"(CAST(sign($num) AS DOUBLE) * ${oRound6(s"abs($num)", den)})"

  /** DuckDB-side spellings of the same. */
  def oSum(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  def oAvg(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c)"
  def oSumRev(price: String, disc: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"
}
