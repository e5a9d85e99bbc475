package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the per-series fold/weight EXPRESSIONS behind
  * q144 (CUSUM) and q133 (EWMA) against plain Scala references, on
  * randomized fixtures the oracle SFs don't reach: n=1, all-equal
  * series (MAD=0 → the h≥1 floor), negative deviations, alarm-reset
  * chains, and sub-window series shorter than the EWMA frame. The
  * DuckDB oracle already cross-checks three real datasets; this pins
  * the expression SEMANTICS on adversarial shapes (it is also the spec
  * that would have caught a DuckDB-1.0-style fold bug on the Spark
  * side — see q144's oracle scaladoc).
  */
class FoldParitySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  private def cusumRef(xs: Seq[Long], med: Long, h: Long): (Long, Long) = {
    var sp = 0L; var sm = 0L; var nh = 0L; var nl = 0L
    xs.foreach { x =>
      val spn = math.max(0L, sp + (x - med))
      val smn = math.max(0L, sm + (med - x))
      if (spn > h) { nh += 1; sp = 0L } else sp = spn
      if (smn > h) { nl += 1; sm = 0L } else sm = smn
    }
    (nh, nl)
  }

  test("q144 cusum fold == reference on 60 random series (incl. MAD=0, n=1)") {
    import spark.implicits._
    val fixtures = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(40)
      val xs =
        if (i % 10 == 0) Seq.fill(n)(500L) // constant: MAD=0, h floor
        else Seq.fill(n)((rnd.nextGaussian() * 300 + 500).toLong.max(0L))
      (i.toLong, xs)
    }
    val df = fixtures.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (x, j) => (g, j.toLong, x) }
    }.toDF("g", "t", "c")
    val got = df.groupBy(col("g"))
      .agg(sort_array(collect_list(col("c"))).as("vs"),
        sort_array(collect_list(struct(col("t"), col("c")))).as("seq"),
        count(lit(1)).as("n"))
      .withColumn("med", expr("element_at(vs, cast((n + 1) div 2 as int))"))
      .withColumn("mad", expr(
        "element_at(sort_array(transform(vs, v -> abs(v - med))), " +
          "cast((n + 1) div 2 as int))"))
      .withColumn("h", greatest(lit(4L) * col("mad"), lit(1L)))
      .withColumn("f", expr(
        """aggregate(transform(seq, e -> e.c),
          |named_struct('sp', CAST(0 AS BIGINT), 'sm', CAST(0 AS BIGINT),
          |             'nh', CAST(0 AS BIGINT), 'nl', CAST(0 AS BIGINT)),
          |(a, x) -> named_struct(
          |  'sp', CASE WHEN greatest(CAST(0 AS BIGINT), a.sp + (x - med)) > h
          |             THEN CAST(0 AS BIGINT)
          |             ELSE greatest(CAST(0 AS BIGINT), a.sp + (x - med)) END,
          |  'sm', CASE WHEN greatest(CAST(0 AS BIGINT), a.sm + (med - x)) > h
          |             THEN CAST(0 AS BIGINT)
          |             ELSE greatest(CAST(0 AS BIGINT), a.sm + (med - x)) END,
          |  'nh', a.nh + CASE WHEN
          |    greatest(CAST(0 AS BIGINT), a.sp + (x - med)) > h
          |    THEN 1 ELSE 0 END,
          |  'nl', a.nl + CASE WHEN
          |    greatest(CAST(0 AS BIGINT), a.sm + (med - x)) > h
          |    THEN 1 ELSE 0 END))""".stripMargin))
      .select(col("g"), col("med"), col("h"),
        col("f.nh").as("nh"), col("f.nl").as("nl"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    fixtures.foreach { case (g, xs) =>
      val sorted = xs.sorted
      val med = sorted((xs.length + 1) / 2 - 1)
      val mad = xs.map(x => math.abs(x - med)).sorted.apply((xs.length + 1) / 2 - 1)
      val h = math.max(4 * mad, 1L)
      val (nh, nl) = cusumRef(xs, med, h)
      assert(got(g) == ((med, h, nh, nl)),
        s"series $g: got ${got(g)} want ${(med, h, nh, nl)} xs=$xs")
    }
  }

  test("q133 ewma weights == reference on short, exact-window and long series") {
    import spark.implicits._
    val W = 16
    val fixtures = (0 until 30).map { i =>
      val n = 1 + rnd.nextInt(3 * W)
      (i.toLong, Seq.fill(n)(rnd.nextInt(50000).toLong))
    }
    val df = fixtures.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (x, j) => (g, j.toLong, x) }
    }.toDF("g", "t", "peak")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(-(W - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val got = df
      .withColumn("vs", collect_list(col("peak")).over(w))
      .withColumn("num", expr(
        """aggregate(transform(vs, (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)),
          |CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
      .withColumn("den", expr("shiftleft(CAST(1 AS BIGINT), size(vs)) - 1"))
      .select(col("g"), col("t"), col("num"), col("den"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    fixtures.foreach { case (g, xs) =>
      xs.indices.foreach { j =>
        val win = xs.slice(math.max(0, j - W + 1), j + 1)
        val num = win.zipWithIndex.map { case (x, i) => x << i }.sum
        val den = (1L << win.length) - 1
        assert(got((g, j.toLong)) == ((num, den)),
          s"series $g pos $j: got ${got((g, j.toLong))} want ${(num, den)}")
      }
    }
  }
}
