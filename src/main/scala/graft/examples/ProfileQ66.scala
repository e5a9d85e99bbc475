package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ66 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("docs=" + docs.count())
    var t0 = System.nanoTime()
    val sigs = graft.operators.MinHashDedup.signatures(docs, "doc_id", "text", 2, 16)
    println(f"signatures: ${(System.nanoTime()-t0)/1e9}%.2f s, n=${sigs.count()}")
    t0 = System.nanoTime()
    val pairs = graft.operators.MinHashDedup.candidatePairs(docs, "doc_id", "text", 2, 16, 4)
    val n = pairs.count()
    println(f"pairs: ${(System.nanoTime()-t0)/1e9}%.2f s, n=$n")
    // band bucket skew
    t0 = System.nanoTime()
    val banded = sigs.select(col("doc_id"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"), array_join(slice(col("sig"), b*4+1, 4), ",").as("key"))): _*)).as("b"))
      .select(col("b.band").as("band"), col("b.key").as("key"))
    banded.groupBy("band","key").count().orderBy(desc("count")).show(10, false)
    println(f"skew scan: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
