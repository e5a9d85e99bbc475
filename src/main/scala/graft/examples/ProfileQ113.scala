package graft.examples

import graft.Materialize._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head timing of the two exact containment-join strategies
  * (ContainmentDedup scaladoc) on TWO fixtures:
  *
  *  1. the driver's sf documents table — a closed ~1k-shingle vocabulary
  *     (every pair co-occurs), the worst case for prefix filtering;
  *  2. a generated sparse-vocabulary corpus (log-uniform/Zipfian word
  *     frequencies, vocab ≫ docs, 1% planted superset twins) — the
  *     web-corpus shape the prefix filter is built for.
  *
  * Also prints [[graft.operators.ContainmentDedup.estimate]] for each
  * fixture, so the census-based auto chooser's decision can be compared
  * against the measured timings (SCALE.md round-5 crossover table).
  */
object ProfileQ113 {

  /** Deterministic sparse corpus: `nDocs` docs × 40 tokens drawn
    * log-uniformly from a `vocab`-sized id space (heavy head, long rare
    * tail — the Zipf-like shape), plus a superset twin (doc + 10
    * doc-specific header tokens) for every 100th doc. Pure column
    * expressions over spark.range: deterministic, distributed, no
    * driver-side data. */
  def sparseCorpus(spark: SparkSession, nDocs: Long, vocab: Long): DataFrame = {
    def word(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val u = pmod(hash(col("id") * lit(101L) + i), lit(1000003)) / lit(1000003.0)
      concat(lit("w"), floor(pow(lit(vocab.toDouble), u)).cast("long"))
    }
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(39)), i => word(i)), " ").as("text"))
    // twin = full original text + unique header: containment(smaller)=1.0
    val twins = base.where(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(col("text"), lit(" "),
          array_join(transform(sequence(lit(0), lit(9)), j =>
            concat(lit("h"), col("doc_id"), lit("_"), j)), " ")).as("text"))
    base.unionAll(twins)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n pairs)")
    }

    def profile(name: String, docs: DataFrame, t: Double): Unit = {
      val est = graft.operators.ContainmentDedup.estimate(docs, "doc_id", "text", 2, t)
      println(s"[prof] $name estimate: docs=${est.docs} postings=${est.postings} " +
        f"naiveJoinRows=${est.naiveJoinRows}%.3g prefixJoinRows=${est.prefixJoinRows}%.3g " +
        s"-> ${if (est.usePrefix) "PREFIX" else "NAIVE"}")
      (1 to 2).foreach { round =>
        timed(s"$name naive r$round")(graft.operators.ContainmentDedup
          .pairs(docs, "doc_id", "text", 2, t).count())
        timed(s"$name prefix r$round")(graft.operators.ContainmentDedup
          .pairsPrefixFiltered(docs, "doc_id", "text", 2, t).count())
      }
    }

    profile("dense", spark.read.parquet(s"$sfDir/documents.parquet"), 0.8)
    profile("sparse", sparseCorpus(spark, 10000L, 300000L).materialize(), 0.8)
    spark.stop()
  }
}
