package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compare the two top-k-per-group shapes on real data (VERDICT r2 #3):
  *  a) hand-rolled TopKPerGroup (mapPartitions bounded heaps + window)
  *  b) plain `row_number() <= k` window, which Spark 4.1's
  *     InferWindowGroupLimit rewrites to a partial (map-side)
  *     WindowGroupLimit before the shuffle — same asymptotic shape,
  *     but on UnsafeRows with no external-Row encoder round trip.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.examples.TopKBench"
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val base = graft.queries.t(spark, dir, "lineitem").select(
      col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))

    def handRolled() = graft.operators.TopKPerGroup.topK(
      base, Seq("l_returnflag"), "l_extendedprice",
      Seq("l_orderkey", "l_linenumber"), 5)

    def windowForm() = {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      base.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Long): Double = { f; math.min(time(f), time(f)) }

    val h = best(handRolled().count())
    val w = best(windowForm().count())
    println(f"[topk] hand_rolled_mapPartitions: $h%.3f s")
    println(f"[topk] window_InferWindowGroupLimit: $w%.3f s")
    println("[topk] window plan:")
    println(windowForm().queryExecution.executedPlan.toString.linesIterator
      .take(12).mkString("\n"))
    spark.stop()
  }
}
