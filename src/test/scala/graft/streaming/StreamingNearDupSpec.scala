package graft.streaming

import graft.SparkSpec
import graft.operators.MinHashDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup parity: distinct candidate pairs from the
  * stateful LSH stream must equal the batch MinHash path's pairs on the
  * same corpus — including a dup whose two halves arrive in DIFFERENT
  * micro-batches (the cross-batch state the operator exists for) —
  * and the per-bucket cap must bound a hot bucket's emission.
  */
class StreamingNearDupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDup = base.replace("today", "tonight")
  private val unrelated = Seq(
    "spark shuffles partition data across executors during wide transformations",
    "columnar parquet storage enables efficient predicate pushdown and pruning",
    "minhash signatures approximate jaccard similarity between shingle sets",
    "watermarks bound state retention in streaming aggregation pipelines")

  private def batchPairs(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    import spark.implicits._
    MinHashDedup.candidatePairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def streamPairs(batches: Seq[Seq[(Long, String)]],
      maxBucketState: Int = 1000): Set[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val name = s"neardup_out_${System.nanoTime()}"
    val q = StreamingNearDup.pairs(docs, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8,
        maxBucketState = maxBucketState)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("cross-batch planted pair is found; distinct pairs equal batch") {
    val all = (Seq(base) ++ unrelated).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // the near-dup (id 9) arrives two micro-batches after its original
    // (id 0): only cross-batch bucket state can pair them
    val got = streamPairs(Seq(all.take(3), all.drop(3), Seq((9L, nearDup))))
    val want = batchPairs(all :+ (9L -> nearDup))
    assert(got == want, s"stream=$got batch=$want")
    assert(got.contains((0L, 9L)), got)
  }

  test("end-to-end on disk: landing dir -> file stream -> stateful LSH -> parquet sink") {
    import org.apache.spark.sql.types._
    val landing = tmpDir("ndup_landing")
    val outDir = tmpDir("ndup_out")
    val ckpt = tmpDir("ndup_ckpt")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(landing)
    val q = StreamingNearDup.pairs(stream, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      import spark.implicits._
      // batch 1: the original + unrelated docs land as one parquet drop
      ((Seq(base) ++ unrelated).zipWithIndex
        .map { case (t, i) => (i.toLong, t) })
        .toDF("doc_id", "text").write.mode("append").parquet(landing)
      q.processAllAvailable()
      // batch 2: the near-dup lands later — only bucket state can pair it
      Seq((9L, nearDup)).toDF("doc_id", "text")
        .write.mode("append").parquet(landing)
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(outDir).select("doc1", "doc2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 9L)), s"on-disk pairs: $pairs")
  }

  test("saturated hot bucket stops pairing at the cap") {
    // 30 identical docs: every band's bucket saturates at cap 5 —
    // pairs are bounded by C(5,2) per band, and the streamed distinct
    // set equals the batch pairs RESTRICTED to the first 5 arrivals
    val boiler = (0 until 30).map(i => (i.toLong, "empty empty empty empty"))
    val got = streamPairs(Seq(boiler), maxBucketState = 5)
    assert(got == (for (a <- 0 until 5; b <- (a + 1) until 5)
      yield (a.toLong, b.toLong)).toSet, got)
  }
}
