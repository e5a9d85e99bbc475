package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  graft.GraftFunctions.registerAll(spark)

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental pairs equal the full-corpus pairs with new doc2") {
    val split = 25L
    val full = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 4)
    val expected = pairSet(full.where(col("doc2") >= split))

    val history = MinHashDedup.signatures(
      docs.where(col("doc_id") < split), "doc_id", "text", 2, 16)
    val fresh = MinHashDedup.signatures(
      docs.where(col("doc_id") >= split), "doc_id", "text", 2, 16)
    val got = pairSet(MinHashDedup.incrementalPairsFromSignatures(
      history, fresh, "doc_id", numHashes = 16, bands = 4))

    assert(got == expected)
    // sanity: the corpus actually has near-dup pairs crossing the split
    assert(expected.nonEmpty, "fixture should produce cross-split pairs")
    // and no pair pairs history against history
    assert(got.forall(_._2 >= split))
  }

  test("empty new batch yields no pairs without touching history pairs") {
    val history = MinHashDedup.signatures(docs, "doc_id", "text", 2, 16)
    val fresh = history.where(lit(false))
    val got = MinHashDedup.incrementalPairsFromSignatures(
      history, fresh, "doc_id", 16, 4)
    assert(got.count() == 0)
  }
}
