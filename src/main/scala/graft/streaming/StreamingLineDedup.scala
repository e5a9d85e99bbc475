package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming line-level dedup — the low-latency tier of q158's
  * CCNet-style boilerplate pass: drop a line occurrence once the line
  * has ALREADY been seen in `dupDocs` distinct documents.
  *
  * Contract (prefix-online, deterministic, documented rather than
  * hidden): batch q158 counts the WHOLE corpus before removing, so a
  * boilerplate line vanishes from every document including the first.
  * A stream cannot retro-edit emitted documents, so suppression is
  * strictly-prior: an occurrence survives when fewer than `dupDocs`
  * distinct docs contained the line BEFORE it (within a batch, groups
  * fold in (docId, pos) order, so replays are deterministic). Early
  * documents therefore keep a line that later turns out to be common —
  * exactly the near-dup two-tier design: this operator is the
  * low-latency filter, the batch q158 pass over landed data remains
  * the full-corpus backstop.
  *
  * State per line is O(dupDocs): the distinct-doc list is dropped the
  * moment it reaches the threshold (a saturated line needs only one
  * bit), and idle lines expire after `idleTimeout` — the same
  * cap-and-TTL bounding as StreamingNearDup.
  *
  * Scale shape: the chunker is a per-row projection (no shuffle); the
  * one shuffle is the groupByKey on line text — the same key the batch
  * counting pass aggregates on.
  */
object StreamingLineDedup {

  /** A surviving line occurrence. */
  case class KeptLine(docId: Long, pos: Int, line: String)

  /** Per-line memory: distinct docs seen so far, or saturated. */
  case class LineState(docs: List[Long], saturated: Boolean)

  /** Split `textCol` into non-overlapping `lineWords`-word lines with
    * positions — shared shape with q158's batch chunker. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      lineWords: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("docId"),
      posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(split($textCol, ' ')) / $lineWords.0) AS int) - 1),
           | i -> array_join(slice(split($textCol, ' '), i * $lineWords + 1, $lineWords), ' '))"""
          .stripMargin.replace("\n", ""))).as(Seq("pos", "line")))

  /** Surviving line occurrences for a streaming `(id, text)` source.
    *
    * @param idleTimeout e.g. "1 hour": line state idle this long is
    *        dropped; null disables expiry (tests / bounded replays)
    */
  def kept(docs: DataFrame, idCol: String, textCol: String,
      lineWords: Int = 3, dupDocs: Int = 2,
      idleTimeout: String = null): Dataset[KeptLine] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = chunk(docs, idCol, textCol, lineWords)
      .select(col("docId"), col("pos"), col("line"))
      .as[(Long, Int, String)]
    val timeoutConf =
      if (idleTimeout == null) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    lines
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (line: String, it: Iterator[(Long, Int, String)],
            state: GroupState[LineState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(LineState(Nil, saturated = false))
            var docs = st.docs
            var saturated = st.saturated
            val out = Seq.newBuilder[KeptLine]
            // deterministic fold order within the batch
            it.toSeq.sortBy(o => (o._1, o._2)).foreach { case (doc, pos, l) =>
              val priorCommon = saturated || docs.length >= dupDocs
              if (!priorCommon) out += KeptLine(doc, pos, l)
              if (!saturated && !docs.contains(doc)) {
                docs = doc :: docs
                if (docs.length >= dupDocs) { saturated = true; docs = Nil }
              }
            }
            state.update(LineState(docs, saturated))
            if (idleTimeout != null) state.setTimeoutDuration(idleTimeout)
            out.result().iterator
          }
      }
  }
}
