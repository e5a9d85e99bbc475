package graft.operators

import graft.Materialize._

import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98) — the diversity pass a RAG retrieval stack runs between
  * the ANN shortlist and the context window: greedily select k of the
  * top-N candidates, each step maximizing relevance MINUS the max
  * similarity to anything already selected, so near-duplicate passages
  * don't crowd out coverage.
  *
  * λ is fixed at 1/2, so the argmax of λ·rel − (1−λ)·maxSim is the
  * argmax of (rel − maxSim) — one IEEE subtraction of two 8-dp-rounded
  * cosines, bit-identical on any engine. The empty-set penalty is 0.0
  * (step 1 picks pure argmax relevance). Ties break on the smaller
  * candidate id.
  *
  * Scale shape: the corpus-sized work — scoring every candidate against
  * every query and cutting the per-query top-N shortlist — is one
  * distributed pass (broadcast queries, windowed top-N; the same shape
  * as the brute-force ANN baseline, or swap in the IVF probe upstream).
  * The greedy selection is inherently sequential in k but runs on the
  * shortlist ONLY: queries·N relevance rows + queries·N·(N−1) pairwise
  * sims, both computed distributed (so cosine rounding is decided in
  * one place) and collected under an explicit bound — the same
  * guarded-metadata-collect contract as the ANN query batches. Corpus
  * size never reaches the driver.
  */
object Mmr {

  /** Max shortlist rows (queries × N) the driver greedy will accept. */
  val MaxShortlistRows = 65536

  /** Cap on the collected pairwise-sim frame (shortlist × (N−1) entries;
    * ~8M Map entries ≈ hundreds of MB — the last size a driver-side
    * greedy can justify). */
  val MaxSimRows: Long = 1L << 23

  /** @param queries (query_id: Long, qv: Array[Float]) — small, broadcast.
    * @param corpus  (cand_id: Long, cv: Array[Float]) — any size.
    * @return (query_id, step, cand_id, rel, max_sim, score), k rows per
    *         query, step = selection order starting at 1. */
  def rerank(queries: DataFrame, corpus: DataFrame,
      shortlistN: Int, k: Int): DataFrame = {
    require(shortlistN > 0 && k > 0 && k <= shortlistN,
      s"need 0 < k <= shortlistN, got k=$k N=$shortlistN")
    val spark = queries.sparkSession
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand_id"))
    // one distributed scoring pass; checkpoint so the sim self-join
    // below doesn't re-run the corpus scan per side (q83's contract)
    val short = corpus.crossJoin(broadcast(queries))
      .withColumn("rel", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= shortlistN)
      .select(col("query_id"), col("cand_id"), col("rel"), col("cv"))
      .materialize()
    // pairwise candidate sims WITHIN each query's shortlist — computed
    // distributed so both rel and sim round through the one native
    // vec_cosine kernel; ≤ queries·N² rows
    val a = short.select(col("query_id"), col("cand_id").as("i"), col("cv").as("ci"))
    val b = short.select(col("query_id"), col("cand_id").as("j"), col("cv").as("cj"))
    val sims = a.join(b, Seq("query_id")).where(col("i") =!= col("j"))
      .select(col("query_id"), col("i"), col("j"),
        cosine(col("ci"), col("cj")).as("sim"))

    // driver budget enforced AT the collect, not via a pre-count job on
    // the queries frame: the limit bounds what can ever reach the driver
    // (budget+1 rows), so overflow fails exactly like the r11 pre-count
    // did — without the fixed extra Spark job per call, which r12
    // measured as a 1.3-1.4x regression on sub-second reranks (q162; the
    // queries frame is tiny by contract, so the count was pure
    // scheduling overhead). CollectLimit also makes the guard itself
    // cheap on the materialized shortlist. Tradeoff (accepted, r13
    // ADVICE): rejection is now POST-compute — an over-budget batch
    // pays the shortlist scoring pass before failing, where the r11
    // guard failed before any distributed work. The failure is loud
    // either way; the common case (every legitimate rerank) saves a job.
    val relRows = short.select(col("query_id"), col("cand_id"), col("rel"))
      .limit(MaxShortlistRows + 1).collect()
    require(relRows.length <= MaxShortlistRows,
      s"shortlist exceeds the $MaxShortlistRows driver budget " +
        s"(query batch x shortlistN=$shortlistN) — split the query batch " +
        s"or lower shortlistN")
    // sims is ≤ shortlist × (N−1) rows: bound it BEFORE collecting — a
    // single query at shortlistN=65536 passes the rel guard yet its
    // pairwise frame is ~4.3e9 rows, a driver OOM (r8 advice)
    require(relRows.length.toLong * (shortlistN - 1) <= MaxSimRows,
      s"pairwise sim frame ~${relRows.length.toLong * (shortlistN - 1)} rows " +
        s"exceeds $MaxSimRows — lower shortlistN (greedy MMR is " +
        s"driver-side by design; the shortlist is the ANN output, not the corpus)")
    val simMap: Map[(Long, Long, Long), Double] = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap

    val out = Seq.newBuilder[Row]
    relRows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach {
      case (qid, rows) =>
        var remaining = rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy(_._1).toList
        var selected = List.empty[Long]
        var step = 1
        while (step <= k && remaining.nonEmpty) {
          // argmax(rel − maxSimToSelected), ties to the smaller cand_id
          // (remaining is id-sorted, so strict > keeps the first)
          var bestId = -1L; var bestRel = 0.0; var bestPen = 0.0
          var bestScore = Double.NegativeInfinity
          remaining.foreach { case (cid, rel) =>
            val pen =
              if (selected.isEmpty) 0.0
              else selected.map(s => simMap((qid, cid, s))).max
            val score = rel - pen
            if (score > bestScore) {
              bestScore = score; bestId = cid; bestRel = rel; bestPen = pen
            }
          }
          out += Row(qid, step.toLong, bestId, bestRel, bestPen, bestScore)
          selected ::= bestId
          remaining = remaining.filterNot(_._1 == bestId)
          step += 1
        }
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("step", LongType, nullable = false),
      StructField("cand_id", LongType, nullable = false),
      StructField("rel", DoubleType, nullable = false),
      StructField("max_sim", DoubleType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1), schema)
  }
}
