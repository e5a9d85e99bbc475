package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BudgetSelect's distributed per-group prefix sum must reproduce the
  * single-window form exactly — same kept rows, same exclusive priors —
  * whatever the input partitioning, and the kept set must respect every
  * group's budget.
  */
class BudgetSelectSpec extends SparkSpec {

  // unsorted keys, several groups with different sizes, spiky weights,
  // a preference column with deliberate ties (key breaks them), and a
  // per-group budget that keeps roughly half of each group
  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val g = s"src${i % 5}"
      val k = (i.toLong * 7919) % n
      val pref = (i % 13).toDouble / 13.0
      val w = if (i % 89 == 0) 500L else (i % 23).toLong + 1L
      (g, k, pref, w)
    }.toDF("g", "k", "pref", "w").repartition(7)
  }

  private def withBudgets(n: Int) = {
    val d = docs(n)
    val b = d.groupBy(col("g")).agg(expr("sum(w) div 2").as("budget"))
    d.join(broadcast(b), "g")
  }

  private def run(form: org.apache.spark.sql.DataFrame) =
    form.select(col("g"), col("k"), col("sel_prior"))
      .orderBy(col("g"), col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("distributed form equals the single-window form (kept rows + priors)") {
    for (n <- Seq(20, 2000)) {
      val in = withBudgets(n)
      val pref = Seq(col("pref") -> false)
      val got = run(BudgetSelect.distributedSelect(
        in, col("g"), pref, "k", col("w"), col("budget")))
      val want = run(BudgetSelect.windowSelect(
        in, col("g"), pref, "k", col("w"), col("budget")))
      assert(got.nonEmpty && got == want)
    }
  }

  test("every group's kept weight respects its budget; no group is empty") {
    val in = withBudgets(1000)
    val kept = BudgetSelect.distributedSelect(
        in, col("g"), Seq(col("pref") -> false), "k", col("w"), col("budget"))
      .groupBy(col("g"))
      .agg(sum(col("w")).as("kept_w"), max(col("budget")).as("budget"),
        count(lit(1)).as("n"))
      .collect()
    assert(kept.length == 5)
    kept.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), s"group ${r.getString(0)} over budget")
      assert(r.getLong(3) > 0)
    }
  }

  test("selection is greedy in preference order: a dropped row's prior run " +
      "plus its weight exceeds the budget") {
    val in = withBudgets(300)
    val pref = Seq(col("pref") -> false)
    val kept = BudgetSelect.windowSelect(
      in, col("g"), pref, "k", col("w"), col("budget"))
    // recompute priors for ALL rows, then check the kept predicate matches
    val all = BudgetSelect.windowSelect(
      in, col("g"), pref, "k", col("w"), lit(Long.MaxValue))
    val keptKeys = kept.select(col("g"), col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    all.collect().foreach { r =>
      val key = (r.getAs[String]("g"), r.getAs[Long]("k"))
      val fits = r.getAs[Long]("sel_prior") + r.getAs[Long]("w") <=
        r.getAs[Long]("budget")
      assert(keptKeys.contains(key) == fits, s"row $key greedy mismatch")
    }
  }

  test("size-adaptive entry point matches both forms on a small input") {
    val in = withBudgets(200)
    val pref = Seq(col("pref") -> false)
    val viaSelect = run(BudgetSelect.select(
      in, col("g"), pref, "k", col("w"), col("budget")))
    val viaWindow = run(BudgetSelect.windowSelect(
      in, col("g"), pref, "k", col("w"), col("budget")))
    assert(viaSelect == viaWindow)
  }
}
