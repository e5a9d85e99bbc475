package graft
import org.apache.spark.sql.SparkSession
/** One-off weighted-SimHash measurement on the Zipf fixtures (round-12
  * SCALE.md study) — kept out of ZipfProbe's main family because the
  * weighted forms are not SparkEntry queries. */
object WProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val n32 = operators.SimHashDedup.weightedCandidatePairs(
        docs, "doc_id", "text", maxHd = 2).count()
      val s32 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n64 = operators.SimHashDedup.weightedCandidatePairs64(
        docs, "doc_id", "text", maxHd = 3).count()
      val s64 = (System.nanoTime() - t1) / 1e9
      println(f"[wprobe] $dir: w32 hd<=2 pairs=$n32 ($s32%.2f s); w64 hd<=3 pairs=$n64 ($s64%.2f s)")
    }
    spark.stop()
  }
}
