package graft
import org.apache.spark.sql.SparkSession
object ProfileQ86 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q86_dedup_passages")(spark, sfDir).count()
      println(f"iter $i: ${(System.nanoTime()-t0)/1e9}%.3f s rows=$n")
    }
    SparkEntry.queries("q86_dedup_passages")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
