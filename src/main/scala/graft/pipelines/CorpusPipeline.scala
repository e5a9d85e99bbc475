package graft.pipelines

import graft.functions.TextFunctions
import graft.operators.{DedupClusters, MinHashDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pipeline, composed from
  * the library's operators — the shape a 100 TB data-curation run takes:
  *
  *   PII scrub (email/URL masking — downstream stages see masked text)
  *     → token normalization (optional: consecutive-duplicate collapse,
  *       per-row — the q98 shape)
  *     → paragraph boilerplate removal (optional: segments seen in ≥2
  *       distinct docs dropped, text reassembled — the q96 shape, one
  *       window shuffle on the segment key)
  *     → annotate (quality / repetition / token stats, one linear pass)
  *     → quality + repetition gates (pushdown filter)
  *     → classifier gate (optional: mean hashed-bucket weight vs
  *       threshold — the q87 model-score shape)
  *     → decontamination (optional: drop docs overlapping a broadcast
  *       eval set's shingle hashes — the q83 shape)
  *     → exact dedup (normalized-key groupBy, min-id survivor)
  *     → near-dup dedup (MinHash LSH pairs → connected components →
  *       keeper-only)
  *     → mixture rebalance (deterministic per-stratum hash thresholds)
  *
  * Everything before the LSH band join is a single scan with no shuffle;
  * the whole pipeline shuffles only at: exact-dedup groupBy, LSH band
  * join, cluster contraction rounds, and the final per-stratum count
  * broadcast. Deterministic end to end — same survivors on every run,
  * every cluster size (content-hash thresholds, min-id keepers).
  *
  * Each stage is also independently exposed as a `SparkEntry` query with
  * a DuckDB oracle (q60–q78); this composition is how they run together.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 5,
      minQuality: Double = 0.2,
      scrubPii: Boolean = true, // mask emails/URLs before anything reads text
      normalizeTokens: Boolean = false, // collapse consecutive dup tokens (q98)
      // drop segments of `boilerplateSegTokens` tokens that appear in >=2
      // distinct docs and reassemble the text (q96 shape); docs reduced
      // to nothing fall to the minTokens gate
      dropBoilerplate: Boolean = false,
      boilerplateSegTokens: Int = 8,
      maxTopTokenFrac: Double = 1.0, // repetition gates (1.0 = off)
      maxDupBigramFrac: Double = 1.0,
      // model-score gate (q87 shape): hashed-bucket weight table, keep
      // docs whose mean token weight exceeds the threshold; None = off.
      // A trained fasttext-style model exports exactly this array.
      classifierWeights: Option[Seq[Double]] = None,
      classifierMinScore: Double = 0.0,
      deconShingleK: Int = 3, // decontamination window (q83)
      deconMinShared: Int = 2,
      shingleK: Int = 2,
      numHashes: Int = 16,
      bands: Int = 4,
      maxBucketSize: Int = 0,
      mixturePerMillion: Long = 1000000L) // 1e6 = keep all of smallest stratum

  /** docs(idCol, textCol, strataCol) → kept rows with annotations:
    * (id, text, stratum, n_tokens, n_bpe, quality, top_token_frac,
    * dup_bigram_frac, cluster_id); text is PII-scrubbed when enabled.
    *
    * @param evalTexts optional benchmark eval set (single `text`
    *        column): docs sharing ≥ `deconMinShared` distinct
    *        `deconShingleK`-gram hashes with it are dropped
    *        (decontamination, q83 shape — broadcast probe, linear) */
  def run(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, cfg: Config = Config(),
      evalTexts: Option[DataFrame] = None): DataFrame = {
    // 0. PII scrub first, so every downstream stage (annotations,
    // signatures, the kept text itself) sees masked content only
    graft.GraftFunctions.registerAll(docs.sparkSession)
    val scrubbed =
      if (!cfg.scrubPii) docs.withColumn("_text", col(textCol))
      else docs.withColumn("_text",
        regexp_replace(
          regexp_replace(col(textCol), graft.queries.TextQueries.UrlRe, "<URL>"),
          graft.queries.TextQueries.EmailRe, "<EMAIL>"))

    // 0b. token normalization (q98 shape): consecutive-duplicate
    // collapse, per-row — bound token column, no generator involved
    val normalized =
      if (!cfg.normalizeTokens) scrubbed
      else scrubbed
        .withColumn("_ntk", TextFunctions.tokens(col("_text")))
        .withColumn("_text", array_join(filter(
          transform(sequence(lit(1), size(col("_ntk"))),
            i => when(i === 1, element_at(col("_ntk"), i))
              .when(element_at(col("_ntk"), i) =!= element_at(col("_ntk"), i - 1),
                element_at(col("_ntk"), i))),
          x => x.isNotNull), " "))
        .drop("_ntk")

    // 0c. paragraph boilerplate removal (q96 shape): a fixed-size token
    // segment appearing in >= 2 distinct docs is boilerplate — detected
    // as min!=max doc id over ONE window on the segment key (COUNT
    // DISTINCT is not window-able; min/max are), survivors reassembled
    // in order. Only (id, stratum, text) survive this stage — the
    // downstream annotate reads nothing else.
    val deboiled =
      if (!cfg.dropBoilerplate) normalized
      else {
        val n = cfg.boilerplateSegTokens
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_seg"))
        normalized
          .select(col(idCol), col(strataCol), col("_text"),
            TextFunctions.tokens(col("_text")).as("_tk"))
          .select(col(idCol), col(strataCol), posexplode(
            transform(sequence(lit(0), floor((size(col("_tk")) - 1) / n).cast("int")),
              i => array_join(slice(col("_tk"), i * n + 1, lit(n)), " "))))
          .withColumnRenamed("pos", "_i").withColumnRenamed("col", "_seg")
          .withColumn("_multi",
            min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
          .groupBy(col(idCol))
          .agg(max(col(strataCol)).as(strataCol),
            coalesce(array_join(transform(array_sort(collect_list(
              when(!col("_multi"), struct(col("_i"), col("_seg"))))),
              x => x.getField("_seg")), " "), lit("")).as("_text"))
      }

    // 1. annotate + quality/repetition gates (single scan, codegen'd
    // kernels; repetition stats per q82 — local term_counts, no shuffle)
    val toks = col("_toks")
    val bigrams = transform(slice(toks, lit(1), size(toks) - 1),
      (x, i) => concat_ws(" ", x, get(toks, i + 1)))
    val annotated = deboiled
      .withColumn("_toks", TextFunctions.tokens(col("_text")))
      .select(
        col(idCol).cast("long").as("doc_id"), col("_text").as("text"),
        col(strataCol).as("stratum"),
        size(toks).as("n_tokens"), // same value as tokenCount, one split
        TextFunctions.bpeTokenCount(col("_text")).as("n_bpe"),
        TextFunctions.qualityScore(col("_text")).as("quality"),
        (array_max(transform(call_function("term_counts", toks),
          x => x.getField("cnt"))).cast("double") / size(toks))
          .as("top_token_frac"),
        when(size(toks) <= 1, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(bigrams)).cast("double") /
            (size(toks) - 1))
          .as("dup_bigram_frac"))
      .where(col("n_tokens") >= cfg.minTokens && col("quality") >= cfg.minQuality &&
        col("top_token_frac") <= cfg.maxTopTokenFrac &&
        col("dup_bigram_frac") <= cfg.maxDupBigramFrac)

    // 1b. model-score gate (q87 shape): mean hashed-bucket weight per
    // doc, per-row compute against a broadcast-literal weight table
    val classified = cfg.classifierWeights match {
      case None => annotated
      case Some(w) =>
        val weights = array(w.map(lit): _*)
        val toksC = TextFunctions.tokens(col("text"))
        val score = aggregate(
          transform(toksC, tk => element_at(weights,
            pmod(TextFunctions.tokenHash(tk), lit(w.length.toLong))
              .cast("int") + 1)),
          lit(0.0), (acc, x) => acc + x) / greatest(size(toksC), lit(1))
        annotated.where(score > cfg.classifierMinScore)
    }

    // 1c. decontamination (q83 shape): eval-set shingle hashes are a
    // broadcast set; contaminated doc ids fall out of one equi-join +
    // per-doc count — linear in corpus size, then an anti-join drops them
    val decontaminated = evalTexts match {
      case None => classified
      case Some(ev) =>
        val k = cfg.deconShingleK
        val evSh = ev.select(explode(MinHashDedup
          .shingleHashesFromTokens(col(ev.columns.head), k)).as("_sh")).distinct()
        val hits = classified
          .select(col("doc_id"),
            explode(MinHashDedup.shingleHashesFromTokens(col("text"), k)).as("_sh"))
          .join(broadcast(evSh), "_sh")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("_sh")).as("_n_shared"))
          .where(col("_n_shared") >= cfg.deconMinShared)
          .select(col("doc_id"))
        classified.join(hits, Seq("doc_id"), "left_anti")
    }

    // 2. exact dedup: normalized 3-token-prefix key, min-id survivor
    val exactKey = array_join(slice(TextFunctions.tokens(col("text")), 1, 3), " ")
    val exactSurvivors = decontaminated
      .withColumn("_k", exactKey)
      .withColumn("_keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))))
      .where(col("doc_id") === col("_keeper"))
      .drop("_k", "_keeper")

    // 3. near-dup dedup: LSH pairs → components → keeper-only
    val pairs = MinHashDedup.candidatePairs(exactSurvivors, "doc_id", "text",
      cfg.shingleK, cfg.numHashes, cfg.bands, cfg.maxBucketSize)
    val clustered = DedupClusters.clusters(exactSurvivors, "doc_id",
      pairs, "doc1", "doc2")
    // materialized once: the mixture stage below consumes nearSurvivors
    // three times (stratum counts, their min, and the output join) — an
    // unmaterialized lineage would re-run the annotate scan, exact-dedup
    // window and LSH band join per consumer
    val nearSurvivors = exactSurvivors
      .join(clustered.where(col("is_keeper") === 1).select(col("doc_id"), col("cluster_id")),
        "doc_id")
      .localCheckpoint()

    // 4. mixture rebalance: downsample every stratum toward the smallest
    val cnts = nearSurvivors.groupBy(col("stratum")).agg(count(lit(1)).as("_cnt"))
    val mn = cnts.agg(min(col("_cnt")).as("_min_cnt"))
    nearSurvivors
      .join(broadcast(cnts), "stratum")
      .crossJoin(broadcast(mn))
      .where(pmod(TextFunctions.charFingerprint(col("text")), lit(1000000L)) * col("_cnt") <
        col("_min_cnt") * lit(cfg.mixturePerMillion))
      .drop("_cnt", "_min_cnt")
  }
}
