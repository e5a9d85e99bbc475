package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.Tables.registerAll(spark, dir)
    val docs = spark.table("documents")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm
    time("warm count")(docs.count())
    time("naive pairs only") {
      graft.operators.ContainmentDedup.pairs(docs, "doc_id", "text", 2, 0.8)
        .orderBy(col("doc1"), col("doc2")).collect().length
    }
    time("estimate only") {
      graft.operators.ContainmentDedup.estimate(docs, "doc_id", "text", 2, 0.8)
    }
    time("pairsAuto") {
      graft.operators.ContainmentDedup.pairsAuto(docs, "doc_id", "text", 2, 0.8)
        .orderBy(col("doc1"), col("doc2")).collect().length
    }
    spark.stop()
  }
}
