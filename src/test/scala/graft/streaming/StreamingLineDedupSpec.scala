package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming line-dedup parity: the stateful stream must implement the
  * strictly-prior suppression rule EXACTLY — an occurrence survives iff
  * fewer than `dupDocs` distinct docs contained its line before it (in
  * (batch, docId, pos) order) — including suppression across
  * micro-batches, which is the cross-batch state the operator exists
  * for. The reference fold is ten lines of plain Scala over the same
  * arrival order.
  */
class StreamingLineDedupSpec extends SparkSpec {

  private val DupDocs = 2
  private val LineW = 3

  /** The strictly-prior rule as a plain fold over arrival order. */
  private def referenceKept(batches: Seq[Seq[(Long, String)]])
      : Set[(Long, Int, String)] = {
    val seen = scala.collection.mutable.Map.empty[String, Set[Long]]
    val out = Set.newBuilder[(Long, Int, String)]
    for {
      batch <- batches
      (doc, text) <- batch.sortBy(_._1)
      words = text.split(' ')
      (chunk, pos) <- words.grouped(LineW).map(_.mkString(" ")).zipWithIndex
    } {
      val docs = seen.getOrElse(chunk, Set.empty)
      if (docs.size < DupDocs) out += ((doc, pos, chunk))
      seen(chunk) = docs + doc
    }
    out.result()
  }

  private def streamKept(batches: Seq[Seq[(Long, String)]])
      : Set[(Long, Int, String)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val name = s"linededup_out_${System.nanoTime()}"
    val q = StreamingLineDedup.kept(docs, "doc_id", "text",
        lineWords = LineW, dupDocs = DupDocs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).select(col("docId"), col("pos"), col("line"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
  }

  private val boiler = "all rights reserved"
  private val docs = Seq(
    0L -> s"alpha beta gamma $boiler",
    1L -> s"delta epsilon zeta $boiler",
    2L -> s"eta theta iota $boiler unique tail words",
    3L -> s"$boiler solo line")

  test("strictly-prior suppression matches the reference fold (one batch)") {
    val got = streamKept(Seq(docs))
    val want = referenceKept(Seq(docs))
    assert(got == want, s"stream=$got\nref=$want")
    // docs 0 and 1 keep the boilerplate (0 and 1 prior docs); 2 and 3
    // arrive after two distinct docs contained it -> suppressed
    assert(got.contains((0L, 1, boiler)) && got.contains((1L, 1, boiler)))
    assert(!got.exists(k => k._1 >= 2L && k._3 == boiler))
    // unique content always survives
    assert(got.contains((2L, 2, "unique tail words")))
  }

  test("suppression state carries across micro-batches") {
    val b1 = docs.take(2) // boilerplate reaches the threshold here
    val b2 = docs.drop(2) // ...so batch-2 occurrences must be dropped
    val got = streamKept(Seq(b1, b2))
    assert(got == referenceKept(Seq(b1, b2)), got)
    assert(!got.exists(k => k._1 >= 2L && k._3 == boiler),
      s"batch-2 boilerplate not suppressed: $got")
  }

  test("a line never reaching the threshold is never suppressed") {
    val solo = Seq(0L -> "one two three", 1L -> "four five six")
    val got = streamKept(Seq(solo))
    assert(got == referenceKept(Seq(solo)))
    assert(got.size == 2)
  }
}
