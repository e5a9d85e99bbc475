package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Perf triage: run selected queries N times each in one JVM and print
  * per-iteration + min times — separates machine noise from real plan
  * regressions (single-shot Bench numbers on a shared VM swing 2×).
  *
  * Usage: runMain graft.examples.RepeatBench q20_window_rank q24_window_ntile
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS.
  */
object RepeatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[repeat] $q%-26s min=${times.min}%6.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
