package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")).take(3000))
    }
    spark.stop()
  }
}
