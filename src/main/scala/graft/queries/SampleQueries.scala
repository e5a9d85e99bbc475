package graft.queries

import graft.Materialize._

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Sampling + corpus-shaping surface for training-data pipelines.
  *
  * All sampling here is DETERMINISTIC (content-hash thresholds, not RNG):
  * the same rows are selected on every run, every engine, every cluster
  * size — reproducible subsets are a hard requirement for training-data
  * lineage, and hash-mod thresholds are the standard trick (same one the
  * q39 flat sample uses). Integer-exact arithmetic keeps the DuckDB
  * oracle bit-identical.
  *
  * Scale shape: every query is scan → (tiny broadcast of per-group
  * thresholds) → filter → linear; no data-sized shuffle anywhere.
  */
object SampleQueries {

  /** Content hash in [0, P): stable across engines (same polynomial). */
  private def fp = TextFunctions.charFingerprint(col("text"))
  private def fpSql = TextFunctions.charFingerprintSql("text")

  // q131 exact-k stratum size; q132 pair support floor + result depth
  private val ExactK = 20
  private val MinSupport = 5
  private val LiftTopK = 50

  val queries: Map[String, Q] = Map(
    // stratified sample: per-language keep-rates (downsample the dominant
    // language, keep half of the rest) — the "rebalance before training"
    // primitive. rate(lang)% of each stratum survives, deterministically.
    "q76_sample_stratified" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(pmod(fp, lit(100)) <
          when(col("lang") === "en", 10).otherwise(50))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // dataset-mixture rebalance: downsample every language stratum to
    // (approximately) the smallest stratum's row count — the
    // uniform-mixture primitive for interleaving skewed corpora (the
    // dominant language's keep-rate is DERIVED FROM THE DATA, unlike
    // q76's fixed rates). Per-stratum keep-rate min_cnt/cnt is applied
    // as an exact integer cross-multiplication against a content-hash
    // bucket in [0, 1e6): (fp % 1e6) * cnt < min_cnt * 1e6. The
    // per-stratum counts are a tiny aggregate (one row per language)
    // broadcast back onto the scan — the corpus itself never shuffles.
    "q77_dataset_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val mn = cnts.agg(min(col("cnt")).as("min_cnt"))
      docs.join(broadcast(cnts), "lang")
        .crossJoin(broadcast(mn))
        .where(pmod(fp, lit(1000000L)) * col("cnt") < col("min_cnt") * lit(1000000L))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // temperature mixture (alpha = 0.5 exponential smoothing, the
    // multilingual-LM sampling scheme): keep-rate per stratum is
    // sqrt(n_min/n_s), so kept shares go as sqrt(n_s) — halfway between
    // natural (keep all) and q77's full equalization. No floating point
    // anywhere: "bucket/1000 < sqrt(n_min/n_s)" squares into
    // bucket^2 * n_s < n_min * 1e6, exact 64-bit integers on both
    // engines (headroom: n_s < 9.2e12). Same scan → broadcast → filter
    // shape as q77; the corpus never shuffles.
    "q101_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
      val mn = cnts.agg(min(col("n_s")).as("n_min"))
      docs.join(broadcast(cnts), "lang")
        .crossJoin(broadcast(mn))
        .withColumn("_b", pmod(fp, lit(1000L)))
        .where(col("_b") * col("_b") * col("n_s") < col("n_min") * lit(1000000L))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // token-length histogram (fixed-width buckets): the corpus-shape
    // report run before choosing sequence lengths. Linear scan, one
    // partial+final aggregate over ~tens of buckets.
    "q78_length_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(TextFunctions.tokenCount(col("text")).as("n_tok"),
          length(col("text")).as("n_chars_txt"))
        .groupBy((col("n_tok") / lit(8)).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"),
          sum(col("n_chars_txt")).as("sum_chars"))
        .orderBy(col("bucket"))),

    // training-shard packing: the corpus's LAST pipeline step — pack
    // documents into ~4096-token shards in deterministic doc_id order
    // (token-offset sharding; operators.ShardPack). The oracle is the
    // single-task `SUM() OVER (ORDER BY)` form ShardPack exists to
    // avoid — exact equality proves the distributed offset arithmetic.
    "q84_shard_pack" -> ((s, dir) =>
      graft.operators.ShardPack.manifest(
        t(s, dir, "documents"),
        col("doc_id"), TextFunctions.tokenCount(col("text")),
        budget = 4096L)),

    // deterministic training order (epoch shuffle): permute the corpus
    // by a salted content hash — same permutation on every run/engine/
    // cluster size, new permutation per salt ("epoch1:"). Exact global
    // positions come from GlobalRank's distributed offset stamping
    // (range partition + parallel sort), never a single-task window.
    "q85_training_order" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.charFingerprint(
          concat(lit("epoch1:"), col("doc_id"))).as("fp"))
      graft.operators.GlobalRank
        .withRowNumber(docs, Seq(col("fp"), col("doc_id")), "pos")
        .select(col("pos"), col("doc_id"))
        .orderBy(col("pos"))
    }),

    // budgeted corpus selection: per source, take the highest-quality
    // documents while the running token count stays within the source's
    // token budget (40% of its total — data-derived, so the query
    // exercises the same regime at every SF). The oracle spells the
    // single-window form; the engine runs BudgetSelect's distributed
    // per-group prefix sum (range partition + per-(partition, group)
    // offsets), which never sorts a whole source in one task — with a
    // handful of sources at 100 TB the window form is a few straggler
    // tasks sorting terabytes each. Exact equality proves the offset
    // arithmetic (the q84 ShardPack pattern, generalized to groups).
    "q102_budget_select" -> ((s, dir) => {
      // the scored frame feeds three consumers (budget rollup, the
      // narrow prefix-sum frame, the join-back) — materialize the
      // narrow scores once so tokenize+quality runs one pass, not three
      // (same call as MinHashDedup.signatures; at full corpus scale
      // this frame is (source, id, 2 longs) — storage-persistable)
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .materialize()
      val budgets = d.groupBy(col("source"))
        .agg(expr("(sum(n_tok) * 2) div 5").as("budget"))
      // the size-adaptive dispatcher (r14): the plain window below the
      // cutover (one sort, no offsets machinery), the distributed
      // prefix sum above — BudgetSelectSpec pins both paths identical
      graft.operators.BudgetSelect.select(
          d.join(broadcast(budgets), "source"),
          groupCol = col("source"),
          prefCols = Seq(col("quality") -> false),
          keyName = "doc_id",
          weightCol = col("n_tok"), budgetCol = col("budget"))
        .select(col("source"), col("doc_id"), col("n_tok"),
          col("quality"), col("sel_prior"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // per-source median-length filter: keep documents strictly longer
    // (in tokens) than their source's median — the "drop the short half
    // of every source" quality gate, with the cut derived per group
    // rather than fixed. The per-source thresholds are a tiny exact
    // percentile aggregate (one row per source; exact `percentile`
    // holds a count-map per group, bounded by distinct token counts —
    // at true corpus scale swap in approx_percentile) broadcast back
    // onto the scan: the corpus itself never shuffles. Median of
    // integers interpolates to an exact .0/.5 double identically in
    // both engines, so the comparison cannot wobble.
    "q103_quantile_filter" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      val thr = d.groupBy(col("source"))
        .agg(expr("percentile(n_tok, 0.5)").as("med_tok"))
      d.join(broadcast(thr), "source")
        .where(col("n_tok") > col("med_tok"))
        .select(col("source"), col("doc_id"), col("n_tok"), col("med_tok"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // per-source corpus report card — the dataset-summary artifact a
    // curation run publishes: doc/token totals, exact mean quality
    // (decimal(18,6) sum — quality carries 6 dp, the money-grade
    // dec(18,2) helper would truncate it), median length, language
    // breadth, exact-dup incidence. One scan feeds both aggregates
    // (per-source stats + the fingerprint dup census); everything after
    // is metadata-sized. dup_frac rounds integer-exactly (round6):
    // per-source doc counts can carry 2^7 of powers of two.
    "q106_corpus_report" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("lang"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
          TextFunctions.qualityScore(col("text")).as("q"), fp.as("fp"))
        .materialize() // two consumers: stats + dup census
      val dup = d.groupBy(col("source"), col("fp"))
        .agg(count(lit(1)).as("c")).where(col("c") >= 2)
        .groupBy(col("source")).agg(sum(col("c")).as("n_dup_docs"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          (sum(col("q").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mean_quality"),
          expr("percentile(n_tok, 0.5)").as("med_tok"),
          countDistinct(col("lang")).as("n_langs"))
        .join(broadcast(dup), Seq("source"), "left")
        .withColumn("n_dup_docs", coalesce(col("n_dup_docs"), lit(0L)))
        .withColumn("dup_frac", round6(col("n_dup_docs"), col("n_docs")))
        .orderBy(col("source"))
    }),

    // EXACT-k per-stratum sample (q76's rate-based sibling): precisely k
    // docs per language, chosen by content-hash order — the
    // deterministic equivalent of per-stratum reservoir sampling
    // (Vitter's algorithm R keeps a uniform k; hash order makes the
    // same k reproducible across runs/engines/cluster sizes). Selection
    // rides TopKPerGroup's bounded map-side heaps — a 1e9-row stratum
    // contributes partitions·k rows to the shuffle, never the stratum.
    "q131_sample_exact_k" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        fp.as("fp"), (-fp).as("neg_fp"))
      graft.operators.TopKPerGroup
        .topK(d, Seq("lang"), "neg_fp", Seq("doc_id"), ExactK)
        .select(col("lang"), col("rn").cast("long").as("rn"),
          col("doc_id"), col("fp"))
        .orderBy(col("lang"), col("rn"))
    }),

    // token co-occurrence lift mining (PMI's rational twin, log-free and
    // int64-exact like q117's DSIR ratio): lift(a,b) =
    // P(a,b)/(P(a)P(b)) = c_ab·N / (c_a·c_b) over doc-level
    // co-occurrence. operators.CoocLift mines the qualified pairs:
    // lossless a-priori df≥support prune, map-side pair generation from
    // each doc's sorted token array (no self-join), hash-dictionary
    // (long, long) pair keys with a collision-guarded exact fallback.
    // The oracle spells the naive self-join.
    "q132_cooccurrence_lift" -> ((s, dir) => {
      val div = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        call_function("div", a, b)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("tk"))
        .materialize() // two consumers: pair mining + the N census
      val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
      graft.operators.CoocLift.pairsAuto(docs, "doc_id", "tk", MinSupport)
        .crossJoin(n)
        .select(col("a"), col("b"), col("c_ab"),
          (div(mulGuard(mulGuard(col("c_ab"), col("n_docs"), "lift num"),
            lit(1000000L), "lift scale"),
            mulGuard(col("c_a"), col("c_b"), "lift den"))
            .cast("double") / 1000000.0).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(LiftTopK)
    }),

    // context-window sequence packing: concatenate the corpus's token
    // stream in doc_id order and split it into 1024-token training
    // sequences, docs crossing boundaries (GPT-style pack-then-split).
    // Output = the segment map / provenance index, one row per
    // (sequence, doc) intersection (operators.SequencePack over the
    // distributed ShardPack prefix sum). The oracle is the single-task
    // `SUM() OVER (ORDER BY)` + generate_series form the operator
    // exists to avoid — exact equality proves the segment arithmetic.
    // sequence-length planning report: for each candidate context
    // length, what one-doc-per-sequence training would truncate (tokens
    // past L) and pad (slack below L), versus the packed lower bound
    // ceil(total/L) that q159's pack-then-split achieves — the report a
    // team reads BEFORE choosing L and a packing regime. One corpus
    // scan: per-doc token count, a per-row explode over the 4-length
    // literal (no join), one hash aggregate. All-integer; the two
    // fractions round through the shared round6 (headroom num < 4.6e12
    // — a 100 TB corpus reports per shard and sums the integer columns,
    // which stay exact).
    "q165_seqlen_planning" -> ((s, dir) => {
      val lens = Seq(128L, 256L, 512L, 1024L)
      t(s, dir, "documents")
        .select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
        .select(col("n"), explode(lit(lens.toArray)).as("seq_len"))
        .groupBy(col("seq_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("total_tokens"),
          sum(when(col("n") > col("seq_len"), 1L).otherwise(0L)).as("docs_over"),
          sum(greatest(col("n") - col("seq_len"), lit(0L))).as("trunc_tokens"),
          sum(col("seq_len") - least(col("n"), col("seq_len"))).as("pad_tokens"))
        .select(col("seq_len"), col("n_docs"), col("total_tokens"),
          col("docs_over"), col("trunc_tokens"),
          round6(col("trunc_tokens"), col("total_tokens")).as("trunc_frac"),
          col("pad_tokens"),
          round6(col("pad_tokens"),
            mulGuard(col("n_docs"), col("seq_len"), "q165 pad denom"))
            .as("pad_frac"),
          call_function("div",
            col("total_tokens") + col("seq_len") - lit(1L), col("seq_len"))
            .as("seqs_if_packed"))
        .orderBy(col("seq_len"))
    }),

    // mixture epoch planner: given per-source mixture weights (the
    // DoReMi/data-mixing config, per-mille so everything stays
    // integer) and a token budget derived from the corpus (2× total —
    // scale-free), report per source the target token draw, the epoch
    // count that requires (exact rational, round6), and whether the
    // source is over-sampled past one epoch — the one-look report that
    // says which sources will repeat and how hard. One scan, one
    // 4-row aggregate joined to a broadcast 1-row total.
    "q169_mixture_plan" -> ((s, dir) => {
      val srcTok = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text")).cast("long"))
          .as("tokens"))
        .withColumn("w",
          substring(col("source"), 4, 10).cast("long") + 1L)
      val total = srcTok.agg(sum(col("tokens")).as("corpus_tokens"),
        sum(col("w")).as("w_total"))
      srcTok.crossJoin(broadcast(total))
        .select(col("source"), col("tokens"), col("w").as("weight_share"),
          call_function("div",
            lit(2L) * col("corpus_tokens") * col("w"), col("w_total"))
            .as("target_tokens"))
        .withColumn("epochs",
          round6(col("target_tokens"), col("tokens")))
        .withColumn("oversampled", col("target_tokens") > col("tokens"))
        .orderBy(col("source"))
    }),

    // length-bucketed batching plan: pad-to-longest batches of B=32
    // under two orderings — length-sorted (the dynamic-batching /
    // bucketed-inference standard) vs arrival order — with per-batch
    // padding waste, so the report quantifies what length bucketing
    // saves. Exact global ranks come from GlobalRank's distributed
    // offset stamping (never a single-task sort of the corpus); each
    // plan is then one hash aggregate on batch_id.
    "q167_batch_plan" -> ((s, dir) => {
      val B = 32L
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      def plan(name: String, sort: Seq[org.apache.spark.sql.Column]) =
        graft.operators.GlobalRank.withRowNumber(docs, sort, "rn")
          .select(lit(name).as("plan"),
            call_function("div", col("rn") - 1L, lit(B)).as("batch_id"),
            col("n"))
          .groupBy(col("plan"), col("batch_id"))
          .agg(count(lit(1)).as("n_docs"),
            max(col("n")).as("max_toks"),
            sum(col("n")).as("sum_toks"))
          .withColumn("pad_tokens",
            col("max_toks") * col("n_docs") - col("sum_toks"))
      plan("by_length", Seq(col("n").desc, col("doc_id")))
        .unionAll(plan("by_id", Seq(col("doc_id"))))
        .orderBy(col("plan"), col("batch_id"))
    }),

    // doc-aligned best-fit packing (the "fewer truncations" regime —
    // operators.BestFitPack): per source, chunk docs only past L=256,
    // then best-fit-decreasing bins; documents never straddle sequence
    // boundaries. The oracle replays the IDENTICAL greedy as a
    // recursive CTE in per-source lockstep — each iteration places each
    // source's next chunk into its smallest fitting open bin — so the
    // whole placement map is hash-checked, not just summary stats.
    "q166_bestfit_pack" -> ((s, dir) =>
      graft.operators.BestFitPack.pack(
        t(s, dir, "documents"),
        col("source"), col("doc_id"), TextFunctions.tokenCount(col("text")),
        seqLen = 256L)
        .select(col("group").as("source"), col("key").as("doc_id"),
          col("chunk_id"), col("n_toks"), col("bin_id"), col("bin_off"))
        .orderBy(col("source"), col("bin_id"), col("bin_off"))),

    "q159_sequence_pack" -> ((s, dir) =>
      graft.operators.SequencePack.segments(
        t(s, dir, "documents"),
        col("doc_id"), TextFunctions.tokenCount(col("text")),
        seqLen = 1024L)
        .select(col("seq_id"), col("key").as("doc_id"),
          col("seq_off"), col("doc_off"), col("n_toks"))
        .orderBy(col("seq_id"), col("doc_id")))
  )

  val oracles: Map[String, String] = Map(
    "q76_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $fpSql % 100 < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
         |ORDER BY doc_id""".stripMargin,

    "q77_dataset_mixture" ->
      s"""WITH cnts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
         |mn AS (SELECT MIN(cnt) AS min_cnt FROM cnts)
         |SELECT doc_id, lang FROM documents JOIN cnts USING (lang) CROSS JOIN mn
         |WHERE ($fpSql % 1000000) * cnt < min_cnt * 1000000
         |ORDER BY doc_id""".stripMargin,

    "q101_temperature_mix" ->
      s"""WITH cnts AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
         |mn AS (SELECT MIN(n_s) AS n_min FROM cnts),
         |d AS (SELECT doc_id, documents.lang, n_s, n_min,
         |    ($fpSql % 1000) AS b
         |  FROM documents JOIN cnts USING (lang) CROSS JOIN mn)
         |SELECT doc_id, lang FROM d
         |WHERE b * b * n_s < n_min * 1000000
         |ORDER BY doc_id""".stripMargin,

    "q78_length_histogram" ->
      s"""SELECT CAST(len(string_split_regex(trim(text), '\\s+')) // 8 AS BIGINT) AS bucket,
         |  COUNT(*) AS n_docs,
         |  MIN(len(string_split_regex(trim(text), '\\s+'))) AS min_tok,
         |  MAX(len(string_split_regex(trim(text), '\\s+'))) AS max_tok,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q84_shard_pack" ->
      s"""WITH d AS (SELECT doc_id,
         |    len(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
         |c AS (SELECT doc_id, w,
         |    COALESCE(SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         |  FROM d)
         |SELECT CAST(prior // 4096 AS BIGINT) AS shard_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(w) AS BIGINT) AS shard_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    "q85_training_order" ->
      s"""WITH d AS (SELECT doc_id,
         |    ${TextFunctions.charFingerprintSql("('epoch1:' || doc_id)")} AS fp
         |  FROM documents)
         |SELECT ROW_NUMBER() OVER (ORDER BY fp, doc_id) AS pos, doc_id
         |FROM d ORDER BY pos""".stripMargin,

    "q102_budget_select" ->
      s"""WITH d AS (SELECT source, doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         |    ${TextFunctions.qualityScoreSql("text")} AS quality
         |  FROM documents),
         |b AS (SELECT source, CAST((SUM(n_tok) * 2) // 5 AS BIGINT) AS budget
         |  FROM d GROUP BY source),
         |c AS (SELECT d.source, doc_id, n_tok, quality, budget,
         |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY d.source
         |      ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS sel_prior
         |  FROM d JOIN b USING (source))
         |SELECT source, doc_id, n_tok, quality, sel_prior FROM c
         |WHERE sel_prior + n_tok <= budget
         |ORDER BY source, doc_id""".stripMargin,

    "q103_quantile_filter" ->
      s"""WITH d AS (SELECT source, doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |thr AS (SELECT source, quantile_cont(n_tok, 0.5) AS med_tok
         |  FROM d GROUP BY source)
         |SELECT d.source, doc_id, n_tok, med_tok
         |FROM d JOIN thr ON d.source = thr.source
         |WHERE n_tok > med_tok
         |ORDER BY d.source, doc_id""".stripMargin,

    "q106_corpus_report" ->
      s"""WITH d AS (SELECT source, lang,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         |    ${TextFunctions.qualityScoreSql("text")} AS q,
         |    $fpSql AS fp
         |  FROM documents),
         |dup AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_dup_docs
         |  FROM (SELECT source, fp, COUNT(*) AS c FROM d GROUP BY 1, 2)
         |  WHERE c >= 2 GROUP BY source),
         |rep AS (SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_quality,
         |    quantile_cont(n_tok, 0.5) AS med_tok,
         |    COUNT(DISTINCT lang) AS n_langs
         |  FROM d GROUP BY source)
         |SELECT r.source, n_docs, n_tokens, mean_quality, med_tok, n_langs,
         |  COALESCE(n_dup_docs, 0) AS n_dup_docs,
         |  ${oRound6("COALESCE(n_dup_docs, 0)", "n_docs")} AS dup_frac
         |FROM rep r LEFT JOIN dup USING (source)
         |ORDER BY r.source""".stripMargin,

    "q131_sample_exact_k" ->
      s"""WITH d AS (SELECT doc_id, lang, $fpSql AS fp FROM documents),
         |r AS (SELECT lang, doc_id, fp,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY fp, doc_id)
         |      AS rn FROM d)
         |SELECT lang, rn, doc_id, fp FROM r WHERE rn <= $ExactK
         |ORDER BY lang, rn""".stripMargin,

    "q132_cooccurrence_lift" ->
      s"""WITH d AS (SELECT doc_id,
         |    list_sort(list_distinct(string_split_regex(trim(text), '\\s+')))
         |      AS tk FROM documents),
         |t AS (SELECT doc_id, unnest(tk) AS w FROM d),
         |cw AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
         |n AS (SELECT COUNT(*) AS n_docs FROM d),
         |p AS (SELECT x.w AS a, y.w AS b
         |  FROM t x JOIN t y ON x.doc_id = y.doc_id AND x.w < y.w),
         |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM p GROUP BY a, b
         |        HAVING COUNT(*) >= $MinSupport)
         |SELECT a, b, c_ab,
         |  CAST(c_ab * n_docs * 1000000 // (ca.c * cb.c) AS DOUBLE)
         |    / 1000000.0 AS lift
         |FROM cab JOIN cw ca ON cab.a = ca.w JOIN cw cb ON cab.b = cb.w
         |CROSS JOIN n
         |ORDER BY c_ab * n_docs * 1000000 // (ca.c * cb.c) DESC, a, b
         |LIMIT $LiftTopK""".stripMargin,

    "q169_mixture_plan" ->
      s"""WITH st AS (SELECT source,
         |    CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         |      AS tokens,
         |    CAST(CAST(substr(source, 4) AS BIGINT) + 1 AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS corpus_tokens,
         |    CAST(SUM(w) AS BIGINT) AS w_total FROM st),
         |p AS (SELECT source, tokens, w AS weight_share,
         |    (2 * corpus_tokens * w) // w_total AS target_tokens
         |  FROM st, tot)
         |SELECT source, tokens, weight_share, target_tokens,
         |  ${oRound6("target_tokens", "tokens")} AS epochs,
         |  (target_tokens > tokens) AS oversampled
         |FROM p ORDER BY source""".stripMargin,

    "q167_batch_plan" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |r AS (SELECT 'by_length' AS plan,
        |    (row_number() OVER (ORDER BY n DESC, doc_id) - 1) // 32
        |      AS batch_id, n FROM d
        |  UNION ALL
        |  SELECT 'by_id', (row_number() OVER (ORDER BY doc_id) - 1) // 32,
        |    n FROM d)
        |SELECT plan, CAST(batch_id AS BIGINT) AS batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MAX(n) AS max_toks,
        |  CAST(SUM(n) AS BIGINT) AS sum_toks,
        |  CAST(MAX(n) * COUNT(*) - SUM(n) AS BIGINT) AS pad_tokens
        |FROM r GROUP BY plan, batch_id
        |ORDER BY plan, batch_id""".stripMargin,

    // the best-fit greedy in per-source lockstep: `rk` fixes the
    // processing order (size desc, doc, chunk); each iteration the
    // working table is the placements so far, from which every bin's
    // remaining capacity is derivable — pick the smallest fitting bin
    // (ties low id) or open max(bin_id)+1
    "q166_bestfit_pack" ->
      """WITH RECURSIVE
        |d AS (SELECT source, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
        |  FROM documents),
        |ch AS (SELECT source, doc_id, c AS chunk_id,
        |    CAST(LEAST(256, w - c * 256) AS BIGINT) AS sz
        |  FROM (SELECT source, doc_id, w,
        |      unnest(generate_series(0, (w - 1) // 256)) AS c
        |    FROM d WHERE w > 0)),
        |rk AS (SELECT source, doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |    sz,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sz DESC, doc_id, chunk_id) AS r
        |  FROM ch),
        |mx AS (SELECT max(cnt) AS m FROM (
        |    SELECT count(*) AS cnt FROM rk GROUP BY source)),
        |pl(it, source, doc_id, chunk_id, sz, bin_id, bin_off) AS (
        |  SELECT 1, source, doc_id, chunk_id, sz,
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM rk WHERE r = 1
        |  UNION ALL
        |  (WITH cur AS (SELECT * FROM pl WHERE it < (SELECT m FROM mx)),
        |   done AS (SELECT source, count(*) AS n FROM cur GROUP BY source),
        |   nxt AS (SELECT rk.source, rk.doc_id, rk.chunk_id, rk.sz
        |     FROM rk JOIN done ON rk.source = done.source
        |       AND rk.r = done.n + 1),
        |   rems AS (SELECT source, bin_id,
        |       256 - CAST(sum(sz) AS BIGINT) AS rem,
        |       CAST(sum(sz) AS BIGINT) AS fill
        |     FROM cur GROUP BY source, bin_id),
        |   fit AS (SELECT n.source, r.bin_id, r.fill,
        |       row_number() OVER (PARTITION BY n.source
        |         ORDER BY r.rem, r.bin_id) AS f
        |     FROM nxt n JOIN rems r ON r.source = n.source
        |       AND r.rem >= n.sz),
        |   place AS (SELECT n.source, n.doc_id, n.chunk_id, n.sz,
        |       coalesce(f.bin_id, (SELECT max(c.bin_id) + 1 FROM cur c
        |         WHERE c.source = n.source)) AS bin_id,
        |       coalesce(f.fill, CAST(0 AS BIGINT)) AS bin_off
        |     FROM nxt n LEFT JOIN (SELECT * FROM fit WHERE f = 1) f
        |       ON f.source = n.source)
        |  SELECT it + 1, source, doc_id, chunk_id, sz, bin_id, bin_off
        |  FROM cur
        |  UNION ALL
        |  SELECT (SELECT max(it) FROM cur) + 1, source, doc_id, chunk_id,
        |    sz, bin_id, bin_off FROM place)
        |)
        |SELECT source, doc_id, chunk_id, sz AS n_toks, bin_id, bin_off
        |FROM pl WHERE it = (SELECT m FROM mx)
        |ORDER BY source, bin_id, bin_off""".stripMargin,

    "q165_seqlen_planning" ->
      s"""WITH d AS (SELECT CAST(len(string_split_regex(trim(text), '\\s+'))
         |    AS BIGINT) AS n FROM documents),
         |e AS (SELECT n, unnest([128, 256, 512, 1024]) AS seq_len FROM d),
         |a AS (SELECT CAST(seq_len AS BIGINT) AS seq_len,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n) AS BIGINT) AS total_tokens,
         |    CAST(SUM(CASE WHEN n > seq_len THEN 1 ELSE 0 END) AS BIGINT)
         |      AS docs_over,
         |    CAST(SUM(GREATEST(n - seq_len, 0)) AS BIGINT) AS trunc_tokens,
         |    CAST(SUM(seq_len - LEAST(n, seq_len)) AS BIGINT) AS pad_tokens
         |  FROM e GROUP BY 1)
         |SELECT seq_len, n_docs, total_tokens, docs_over, trunc_tokens,
         |  ${oRound6("trunc_tokens", "total_tokens")} AS trunc_frac,
         |  pad_tokens,
         |  ${oRound6("pad_tokens", "n_docs * seq_len")} AS pad_frac,
         |  (total_tokens + seq_len - 1) // seq_len AS seqs_if_packed
         |FROM a ORDER BY seq_len""".stripMargin,

    "q159_sequence_pack" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w,
        |    CAST(COALESCE(SUM(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prior
        |  FROM d),
        |e AS (SELECT doc_id, w, prior,
        |    unnest(generate_series(prior // 1024, (prior + w - 1) // 1024))
        |      AS seq_id
        |  FROM c WHERE w > 0)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(GREATEST(prior, seq_id * 1024) - seq_id * 1024 AS BIGINT)
        |    AS seq_off,
        |  CAST(GREATEST(prior, seq_id * 1024) - prior AS BIGINT) AS doc_off,
        |  CAST(LEAST(prior + w, (seq_id + 1) * 1024)
        |    - GREATEST(prior, seq_id * 1024) AS BIGINT) AS n_toks
        |FROM e ORDER BY seq_id, doc_id""".stripMargin
  )
}
