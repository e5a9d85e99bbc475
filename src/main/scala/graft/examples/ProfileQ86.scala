package graft.examples

import graft.Materialize._

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B the q86 doc-frequency plan: count-over-window on the shingle
  * hash (1 shuffle + sort) vs groupBy+shuffle-join-back (2 hash
  * shuffles, no sort). The shingle stream uses the NATIVE kernel (what
  * q86 ships) and is checkpointed once, so both arms pay identical
  * input cost and the measurement isolates the plan shape.
  * Run: sbt "runMain graft.examples.ProfileQ86". */
object ProfileQ86 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val sh = docs.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(graft.operators.MinHashDedup
          .shingleHashesFromTokens(col("text"), 8)).as("sh"))
      .materialize()

    def windowForm = {
      val w = Window.partitionBy(col("sh"))
      sh.withColumn("nd", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("nd") >= 2, lit(1))).as("n_dup"))
    }

    def joinForm = {
      val g = sh.groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      sh.join(g, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("nd") >= 2, lit(1))).as("n_dup"))
    }

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("window")(windowForm.count())
    time("join  ")(joinForm.count())
    spark.stop()
  }
}
