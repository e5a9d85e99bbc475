package graft.examples

import org.apache.spark.sql.SparkSession

/** Head-to-head timing of the two exact containment-join strategies
  * (ContainmentDedup scaladoc): the naive count-aggregation join vs the
  * prefix-filtered verify join. On the synthetic sf corpora the
  * vocabulary is closed (~1k distinct shingles → every pair co-occurs),
  * the worst case for prefix filtering — the numbers document WHY q113
  * ships on the naive path at oracle scale while the prefix path is the
  * sparse-vocabulary 100 TB choice. */
object ProfileQ113 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n pairs)")
    }
    (1 to 2).foreach { round =>
      timed(s"naive r$round")(graft.operators.ContainmentDedup
        .pairs(docs, "doc_id", "text", 2, 0.8).count())
      timed(s"prefix r$round")(graft.operators.ContainmentDedup
        .pairsPrefixFiltered(docs, "doc_id", "text", 2, 0.8).count())
    }
    spark.stop()
  }
}
