package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** q65 plan-shape profiler: prefix-filtered vs blocked all-pairs at any
  * SF dir (arg 1, default sf0.1). Backs the round-11 sf1 ratio claim in
  * SCALE.md — the blocked join measured 33.7× at 10× data (r10 sf1
  * step-up); the prefix path must track pair output sub-quadratically. */
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).as("n_tokens"),
        array_distinct(tokens(col("text"))).as("toks"))
    println("docs=" + docs.count())
    def time(name: String, df: => DataFrame): Unit =
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"$name it$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$n")
      }
    time("prefix", graft.operators.JaccardDedup.pairs(
      docs, "doc_id", "toks", Seq("lang", "n_tokens"), 0.5))
    time("auto  ", graft.operators.JaccardDedup.pairsAuto(
      docs, "doc_id", "toks", Seq("lang", "n_tokens"), 0.5))
    time("naive ", graft.operators.JaccardDedup.pairsNaiveBlocked(
      docs, "doc_id", "toks", Seq("lang", "n_tokens"), 0.5))
    spark.stop()
  }
}
