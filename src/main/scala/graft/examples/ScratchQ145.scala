package graft.examples

import graft.{HarnessSession, Materialize}
import graft.Materialize._
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B (r15, deleted before commit): q145 phrase search — the
  * r13 window-census shape vs the r14 zip_with-over-arrays shape, timed
  * in one session at the given SF (VERDICT r14 #5: the r14 sf1 record
  * was load-contaminated; decide keep-vs-gate from a clean measurement).
  */
object ScratchQ145 {

  private def windowShape(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.queries.t(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      .materialize()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val top = toks
      .withColumn("t2", lead(col("tok"), 1).over(w))
      .withColumn("t3", lead(col("tok"), 2).over(w))
      .where(col("t3").isNotNull)
      .select(concat_ws(" ", col("tok"), col("t2"), col("t3")).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("phrase")).limit(1)
      .select(col("phrase"), split(col("phrase"), " ").as("ws"))
    def plist(i: Int) = toks.crossJoin(broadcast(top))
      .where(col("tok") === element_at(col("ws"), i))
    plist(1).select(col("doc_id"), col("pos"), col("phrase"))
      .join(plist(2).select(col("doc_id"), (col("pos") - 1).as("pos")),
        Seq("doc_id", "pos"))
      .join(plist(3).select(col("doc_id"), (col("pos") - 2).as("pos")),
        Seq("doc_id", "pos"))
      .select(col("doc_id"), col("pos"), col("phrase"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** zip_with shape but with the trigram kernel as ONE transform over
    * an index sequence: no slice copies, no zip_with intermediates, one
    * concat_ws per trigram. */
  private def idxShape(s: SparkSession, dir: String): DataFrame = {
    val tk = graft.queries.t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .materialize()
    val toks = tk.select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val tri = expr("CASE WHEN size(tk) < 3 THEN array() ELSE " +
      "transform(sequence(1, size(tk) - 2), " +
      "i -> concat_ws(' ', tk[i - 1], tk[i], tk[i + 1])) END")
    val top = tk.select(explode(tri).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("phrase")).limit(1)
      .select(col("phrase"), split(col("phrase"), " ").as("ws"))
    def plist(i: Int) = toks.crossJoin(broadcast(top))
      .where(col("tok") === element_at(col("ws"), i))
    plist(1).select(col("doc_id"), col("pos"), col("phrase"))
      .join(plist(2).select(col("doc_id"), (col("pos") - 1).as("pos")),
        Seq("doc_id", "pos"))
      .join(plist(3).select(col("doc_id"), (col("pos") - 2).as("pos")),
        Seq("doc_id", "pos"))
      .select(col("doc_id"), col("pos"), col("phrase"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Array shape with the probe as ONE per-row match pass: positions of
    * the top phrase found by filtering an index sequence against the
    * doc's own token array — no probe explodes, no (doc,pos) joins. */
  private def matchShape(s: SparkSession, dir: String): DataFrame = {
    val tk = graft.queries.t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .materialize()
    val n = size(col("tk"))
    val tri = zip_with(
      zip_with(slice(col("tk"), lit(1), greatest(n - 2, lit(0))),
        slice(col("tk"), lit(2), greatest(n - 2, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      slice(col("tk"), lit(3), greatest(n - 2, lit(0))),
      (ab, c) => concat(ab, lit(" "), c))
    val top = tk.select(explode(tri).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("phrase")).limit(1)
      .select(col("phrase"), split(col("phrase"), " ").as("ws"))
    tk.crossJoin(broadcast(top))
      .select(col("doc_id"),
        explode(expr("CASE WHEN size(tk) < 3 THEN array() ELSE " +
          "filter(sequence(1, size(tk) - 2), " +
          "i -> tk[i - 1] = ws[0] AND tk[i] = ws[1] AND tk[i + 1] = ws[2]) END"))
          .as("pos"),
        col("phrase"))
      .orderBy(col("doc_id"), col("pos"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = HarnessSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val zipShape = graft.SparkEntry.queries("q145_phrase_search")
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q145ab] $label%-14s $dt%7.3f s")
      graft.ModelCheckpoint.sweep(spark)
      dt
    }
    // warm each once
    zipShape(spark, sfDir).count(); graft.ModelCheckpoint.sweep(spark)
    windowShape(spark, sfDir).count(); graft.ModelCheckpoint.sweep(spark)
    idxShape(spark, sfDir).count(); graft.ModelCheckpoint.sweep(spark)
    matchShape(spark, sfDir).count(); graft.ModelCheckpoint.sweep(spark)
    val zs = (1 to iters).map(_ => time("zip_with")(zipShape(spark, sfDir).count()))
    val ws = (1 to iters).map(_ => time("window")(windowShape(spark, sfDir).count()))
    val is = (1 to iters).map(_ => time("idx_transform")(idxShape(spark, sfDir).count()))
    val ms = (1 to iters).map(_ => time("match")(matchShape(spark, sfDir).count()))
    // parity sanity: identical rows
    val a = zipShape(spark, sfDir).collect().toSeq
    val b = windowShape(spark, sfDir).collect().toSeq
    val c = idxShape(spark, sfDir).collect().toSeq
    val d = matchShape(spark, sfDir).collect().toSeq
    println(s"[q145ab] parity zip==win: ${a == b}  idx==win: ${c == b}  match==win: ${d.map(_.toString) == b.map(_.toString)} rows=${a.size}")
    println(f"[q145ab] MIN zip_with=${zs.min}%.3f s  window=${ws.min}%.3f s  idx=${is.min}%.3f s  match=${ms.min}%.3f s")
    spark.stop()
  }
}
