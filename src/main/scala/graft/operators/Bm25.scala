package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009)
  * — the lexical-retrieval operator every training-data pipeline uses for
  * quality probes, retrieval-augmented filtering, and contamination
  * checks against evaluation queries.
  *
  * Scale shape (the 100 TB path): the corpus is tokenized ONCE; tokens
  * are filtered to the query vocabulary MAP-SIDE (a `filter` HOF inside
  * the projection, before the generator), so the only shuffled stream is
  * O(matching term occurrences), not the corpus. Per-term document
  * frequencies aggregate from the (doc, term) frame (already tiny) and
  * broadcast back; corpus stats (N, total length) are a 1-row broadcast.
  * Top-k is a TakeOrdered, never a global sort materialization.
  *
  * Two scorers, same plan shape:
  *  - [[topK]]: textbook BM25 (double, log idf) — the production scorer.
  *  - [[topKRational]]: a log-free rational surrogate in pure int64
  *    arithmetic so a DuckDB oracle matches bit-for-bit (q116). The idf
  *    factor is the idf *argument* (N-df+0.5)/(df+0.5) (monotone with
  *    ln of itself), cleared of halves by doubling; the tf saturation
  *    uses k1=1.2, b=0.75 multiplied out to integers:
  *      tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl/avgdl))
  *        = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)      with avgdl = T/N.
  *    Headroom (int64-exact): 22·tf·T·1e6 < 2^63 ⇒ T·tf < 4.2e11, and
  *    idf6·tfp6 < 2^63 ⇒ N/df < 4.2e6 — fine to ~billions of tokens;
  *    beyond that use [[topK]] (doubles don't overflow, ranking only).
  */
object Bm25 {

  /** Shared candidate stats: (doc_id, dl, term, tf) for query terms plus
    * broadcast df-per-term and corpus (n_docs, total_len). */
  private def candidates(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): (DataFrame, DataFrame, DataFrame) = {
    import graft.Materialize._
    // distinct: the map-side tf transform emits one (term, tf) struct
    // per ARRAY ENTRY, so a duplicated query term would double its df
    // and its per-doc score contribution (the pre-r14 explode+groupBy
    // shape was idempotent to duplicates; keep that contract)
    val termArr = array(terms.distinct.map(lit): _*)
    // narrow (doc_id, dl, matched-terms) frame, materialized: the
    // corpus is tokenized ONCE for both consumers (stats + tf) instead
    // of once per aggregate (r14; two full tokenize passes before)
    val tk = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        // query-vocab filter BEFORE the generator: the kept stream
        // carries only matching occurrences
        filter(col("tk"), t => array_contains(termArr, t)).as("qtk"))
      .materialize()
    val stats = tk.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    // per-(doc, term) counts computed MAP-SIDE from each row's matched
    // array (guide §2.3 — aggregate before you shuffle): the former
    // explode + groupBy(doc, dl, term) shuffled every matching
    // occurrence; this ships at most |terms| pre-counted rows per doc
    // and no exchange at all before the df aggregate
    val tf = tk.where(size(col("qtk")) > 0)
      .select(col("doc_id"), col("dl"), explode(
        filter(transform(termArr, t =>
            struct(t.as("term"),
              size(filter(col("qtk"), x => x === t)).cast("long").as("tf"))),
          s => s.getField("tf") > 0L)).as("p"))
      .select(col("doc_id"), col("dl"),
        col("p.term").as("term"), col("p.tf").as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    (tf, dfs, stats)
  }

  /** Textbook BM25 top-k: (doc_id, score, n_terms), score descending,
    * doc_id tie-break. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dfs, stats) = candidates(docs, idCol, textCol, terms)
    tf.join(broadcast(dfs), "term").crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tfn", col("tf") * (lit(k1) + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) +
          lit(b) * col("dl") * col("n_docs") / col("total_len"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf") * col("tfn")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The ADDITIVE index state behind the rational scorer: postings
    * `tf` (doc_id, dl, term, tf), per-term `dfs`, and the 1-row corpus
    * `stats`. Additive = the daily-increment contract (the q91/q105
    * shape for retrieval): a new batch's index simply unions in —
    * postings are disjoint by doc, dfs and stats add — so history is
    * never re-tokenized. In production `tf`/`dfs` persist as parquet and
    * this frame is their scan. */
  final case class Index(tf: DataFrame, dfs: DataFrame, stats: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): Index = {
    val (tf, dfs, stats) = candidates(docs, idCol, textCol, terms)
    Index(tf, dfs, stats)
  }

  /** Merge two disjoint-corpus indexes — postings union, dfs add,
    * stats add. O(|dfs|) + a union of posting scans; no re-tokenize. */
  def mergeIndex(a: Index, b: Index): Index = Index(
    a.tf.unionAll(b.tf),
    a.dfs.unionAll(b.dfs).groupBy(col("term")).agg(sum(col("df")).as("df")),
    a.stats.unionAll(b.stats)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_len")).as("total_len")))

  /** Oracle-parity rational BM25 top-k (see scaladoc): pure int64 until
    * one final cast, so ordering and values match DuckDB exactly. */
  def topKRational(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame =
    topKRationalFromIndex(buildIndex(docs, idCol, textCol, terms), k)

  /** The rational scorer over a (possibly merged) [[Index]]. */
  def topKRationalFromIndex(idx: Index, k: Int): DataFrame = {
    val Index(tf, dfs, stats) = idx
    import graft.queries.mulGuard
    val div = (a: Column, b: Column) => call_function("div", a, b)
    // every product that can exceed int64 goes through mulGuard — a wrap
    // would otherwise be a silent ranking corruption (DuckDB widens to
    // HUGEINT, Spark wraps). The denominators are bounded by the guarded
    // numerators (coefficients 10/3/9 vs the numerator's 22e6), so they
    // need no guard of their own.
    tf.join(broadcast(dfs), "term").crossJoin(broadcast(stats))
      .withColumn("idf6", div(
        mulGuard(lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L,
          lit(1000000L), "bm25 idf"),
        lit(2L) * col("df") + 1L))
      .withColumn("tfp6", div(
        mulGuard(mulGuard(col("tf"), col("total_len"), "bm25 tf*T"),
          lit(22000000L), "bm25 tf-part"),
        lit(10L) * col("tf") * col("total_len") + lit(3L) * col("total_len")
          + lit(9L) * col("dl") * col("n_docs")))
      .withColumn("sc",
        div(mulGuard(col("idf6"), col("tfp6"), "bm25 score"), lit(1000000L)))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("sc_sum"), count(lit(1)).as("n_terms"))
      .orderBy(col("sc_sum").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        (col("sc_sum").cast("double") / 1000000.0).as("score"),
        col("n_terms"))
  }
}
