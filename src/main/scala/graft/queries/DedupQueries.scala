package graft.queries

import graft.Materialize._

import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` — the operators a 100 TB
  * training-data pipeline runs before anything else:
  *  - exact (hash-groupBy on a normalized key);
  *  - n-gram Jaccard near-dup (blocked pairwise — the join is keyed on
  *    (lang, n_tokens) so it shuffles into small blocks instead of a
  *    cross product; at scale the block key becomes a real LSH band);
  *  - MinHash + LSH banding (shingle → signature → band → bucket join);
  *  - SimHash + Hamming distance.
  * All integer arithmetic is engine-exact; DuckDB oracles are generated
  * from the same constants (see TextFunctions *Sql helpers).
  */
object DedupQueries {

  private[graft] val MinHashK = 16
  private[graft] val Bands = 4
  private val RowsPerBand = MinHashK / Bands

  /** The deterministic 90/5/5 split bucket (q100/q168). The id is
    * bounded mod 1000003 BEFORE the Knuth multiply: the raw product
    * wraps past id ~3.5e9 in Spark and errors in DuckDB — at billions
    * of docs the engines would neither agree nor both complete. */
  private def splitOf(id: Column): Column = {
    val bucket = pmod(
      pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000L))
    when(bucket < 900, lit("train"))
      .when(bucket < 950, lit("val"))
      .otherwise(lit("test"))
  }

  /** DuckDB spelling of [[splitOf]] (DuckDB % keeps the sign of the
    * dividend like Spark's pmod only for non-negative ids, which both
    * call sites guarantee). */
  private def oSplitOf(id: String): String =
    s"CASE WHEN ((($id) % 1000003) * 2654435761) % 1000 < 900 THEN 'train' " +
      s"WHEN ((($id) % 1000003) * 2654435761) % 1000 < 950 THEN 'val' " +
      s"ELSE 'test' END"
  // 8-token passages: long enough that cross-doc repeats mean copied
  // spans (near-dup docs), short enough to fire on the synthetic corpus
  private val PassageK = 8

  // q105's persisted history store, one per dataset (see the query)
  private val spanStoreCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.DataFrame]

  val queries: Map[String, Q] = Map(
    // exact dedup on a normalized key (first-3-token prefix): groups
    // with >1 member, keeper = min doc_id (deterministic survivor)
    "q64_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          array_join(slice(tokens(col("text")), 1, 3), " ").as("key3"))
        .groupBy(col("key3"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .where(col("n_copies") > 1)
        .orderBy(col("key3"))),

    // token-set Jaccard near-dup, (lang, n_tokens)-blocked semantics.
    // Candidate generation dispatches on the block census: wide blocks
    // (Σ width² > 1e6 — the r10 sf1 step-up measured the blocked
    // all-pairs join at 33.7× time for 10× data) go to the LOSSLESS
    // prefix filter (PPJoin), whose candidates track rare-token
    // postings instead of block width (measured sf1: 9.6 s vs 31 s,
    // ratio 2.7× vs 24× — sub-output growth); small corpora keep the
    // naive join and skip the prefix path's fixed stage cost. Output
    // (incl. 6-dp rounding) is bit-identical either way —
    // JaccardDedupSpec pins parity on dense and sparse fixtures; the
    // oracle is the unchanged naive SQL.
    "q65_dedup_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).as("n_tokens"),
          array_distinct(tokens(col("text"))).as("toks"))
      graft.operators.JaccardDedup.pairsAuto(docs, "doc_id", "toks",
          Seq("lang", "n_tokens"), minJaccard = 0.5)
        .orderBy(col("doc1"), col("doc2"))
    }),

    // MinHash + LSH: signature -> bands -> bucket join -> candidate pairs
    "q66_dedup_minhash" -> ((s, dir) =>
      graft.operators.MinHashDedup.candidatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 2, numHashes = MinHashK, bands = Bands)
        .orderBy(col("doc1"), col("doc2"))),

    // connected components over the MinHash candidate pairs: transitive
    // near-dup clusters with one keeper (min doc_id) per cluster — the
    // step a dedup pipeline runs after pair generation (pairwise output
    // alone under-deletes chained duplicates). Large-star/small-star
    // contraction; the oracle is an unbounded recursive transitive
    // closure proving the contraction reaches the same fixpoint.
    "q75_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.MinHashDedup.candidatePairs(
        docs, "doc_id", "text", shingleK = 2, numHashes = MinHashK, bands = Bands)
      graft.operators.DedupClusters.clusters(docs, "doc_id", pairs, "doc1", "doc2")
        .orderBy(col("doc_id"))
    }),

    // SimHash near-dup via signature-band blocking: 3 bands of the 32-bit
    // simhash — pigeonhole guarantees every hd<=2 pair shares an 11-bit
    // band, so the result EQUALS brute force (the oracle below is the
    // unblocked O(n²) check proving zero recall loss) while the join
    // buckets on ~2k keys per band instead of token-count blocks.
    "q67_dedup_simhash" -> ((s, dir) =>
      graft.operators.SimHashDedup.candidatePairs(
          t(s, dir, "documents"), "doc_id", "text", maxHd = 2)
        .orderBy(col("doc1"), col("doc2"))),

    // duplicated-passage coverage: the MEASURE step of substring-level
    // dedup (Lee et al. 2021, "Deduplicating Training Data Makes LMs
    // Better") — per document, the fraction of its distinct k-token
    // shingles that also occur in at least one OTHER document. Shape and
    // the skewSafe guard for viral-boilerplate shingles live on
    // operators.PassageCoverage (one window shuffle here; the flag swaps
    // in a groupBy + AQE-splittable join-back — SkewGuardSpec pins
    // parity). Linear at 100 TB, no pairwise anything.
    "q86_dedup_passages" -> ((s, dir) =>
      graft.operators.PassageCoverage
        .stats(t(s, dir, "documents"), "doc_id", "text", PassageK)
        // integer-exact 6-dp rounding (see round6): n_shingles is a
        // per-doc distinct-shingle count that can carry 2^7 (a ~135-token
        // doc has 128 shingles), landing plain round() on a .5e-6 tie
        .withColumn("dup_frac", round6(col("n_dup"), col("n_shingles")))
        .select(col("doc_id"), col("n_shingles"), col("n_dup"), col("dup_frac"))
        .orderBy(col("doc_id"))),

    // leakage-free train/val/test split: assign the split per near-dup
    // CLUSTER, not per document — a near-duplicate pair straddling
    // train and eval leaks the eval answers into training (the
    // published train-test-contamination failure of hash-per-doc
    // splits). Every cluster member inherits the keeper's bucket from
    // a deterministic integer hash, so the assignment is reproducible
    // and no cluster is ever divided. 90/5/5 by construction in
    // expectation; exactness of the CLUSTER property (not the ratios)
    // is what the oracle pins via its recursive-closure clustering.
    "q100_leakfree_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.MinHashDedup.candidatePairs(
        docs, "doc_id", "text", shingleK = 2, numHashes = MinHashK, bands = Bands)
      graft.operators.DedupClusters.clusters(docs, "doc_id", pairs, "doc1", "doc2")
        .select(col("doc_id"), col("cluster_id"),
          splitOf(col("cluster_id")).as("split"))
        .orderBy(col("doc_id"))
    }),

    // split-leakage audit: the quantified case FOR q100's cluster-aware
    // assignment — take the SAME near-dup pair set and count pairs
    // straddling train/eval under (a) the naive per-document hash split
    // and (b) the per-cluster split. (b) is zero BY CONSTRUCTION (both
    // endpoints of a candidate edge share a component, so they share a
    // split); (a) leaks ~2·0.9·0.1 of pairs in expectation — this is
    // the one-look report that tells a team their eval set is (or is
    // not) contaminated by their own split rule. Pair generation and
    // clustering are the L3/L6 production paths; the audit adds two
    // id-keyed joins of the SMALL pair frame against the assignment and
    // one 2-row aggregate.
    "q168_split_leak_audit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.MinHashDedup.candidatePairs(
          docs, "doc_id", "text", shingleK = 2, numHashes = MinHashK,
          bands = Bands)
        .materialize() // feeds the audit AND the clustering below
      val asg = graft.operators.DedupClusters
        .clusters(docs, "doc_id", pairs, "doc1", "doc2")
        .select(col("doc_id"), splitOf(col("cluster_id")).as("csplit"))
      val audited = pairs
        .select(col("doc1"), col("doc2"),
          splitOf(col("doc1")).as("s1"), splitOf(col("doc2")).as("s2"))
        .join(asg.select(col("doc_id").as("doc1"), col("csplit").as("c1")),
          "doc1")
        .join(asg.select(col("doc_id").as("doc2"), col("csplit").as("c2")),
          "doc2")
      // BOTH rule rows from ONE aggregate pass (r14): the former shape
      // checkpointed the pair frame and ran one aggregate per rule plus
      // a union — one pass, one explode of the 1-row result instead
      val onerow = audited
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("c1") =!= col("c2"), 1L).otherwise(0L)).as("nc_c"),
          sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L)).as("nc_d"))
      onerow
        .select(explode(array(
          struct(lit("cluster_hash").as("rule"), col("nc_c").as("n_cross")),
          struct(lit("doc_hash").as("rule"), col("nc_d").as("n_cross"))))
          .as("r"), col("n_pairs"))
        .select(col("r.rule").as("rule"), col("n_pairs"),
          coalesce(col("r.n_cross"), lit(0L)).as("n_cross"),
          when(col("n_pairs") === 0L, lit(0.0))
            .otherwise(round6(coalesce(col("r.n_cross"), lit(0L)),
              col("n_pairs")))
            .as("leak_frac"))
        .orderBy(col("rule"))
    }),

    // incremental near-dup: dedup a NEW batch (top 20% of doc_ids)
    // against the already-ingested history WITHOUT re-pairing history
    // against itself — the daily-increment shape where history is 100 TB
    // and the increment is small. History signatures stream from their
    // store (recomputed here; persisted in production), the band join's
    // probe side carries only the new batch. Result == the full-corpus
    // q66 pairs filtered to new doc2 (ids are append-only monotone).
    "q91_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // one signature pass (checkpointed), split AFTER: two separate
      // signatures() calls would scan the table twice and run two
      // eager checkpoint jobs
      val sigs = graft.operators.MinHashDedup.signatures(
        docs, "doc_id", "text", shingleK = 2, numHashes = MinHashK)
      // split DERIVED from the corpus (floor of 80% of max doc_id, exact
      // integer arithmetic, same scalar in the oracle's subquery) so the
      // history>>increment shape holds at every SF — a fixed constant
      // left the batch empty at sf0.001 (vacuously green) and inverted
      // the scenario above sf0.01. 1-row agg over the CHECKPOINTED
      // signatures: metadata-sized, no second corpus scan.
      val split = sigs.agg(coalesce(max(col("doc_id")).cast("long"), lit(0L)))
        .head.getLong(0) * 8L / 10L
      graft.operators.MinHashDedup.incrementalPairsFromSignatures(
          sigs.where(col("doc_id") < split),
          sigs.where(col("doc_id") >= split),
          "doc_id", numHashes = MinHashK, bands = Bands)
        .orderBy(col("doc1"), col("doc2"))
    }),

    // paragraph-level boilerplate REMOVAL (q86 only measures; this
    // rewrites the corpus): 8-token segments stand in for paragraphs; a
    // segment seen in >= 2 distinct docs is dropped, survivors
    // reassemble in order. Scale reasoning and the one-window shape live
    // on the shared operator (also the pipeline's 0c stage).
    "q96_dedup_paragraphs" -> ((s, dir) =>
      graft.operators.SegmentDedup
        .annotate(t(s, dir, "documents"), "doc_id", "text", 8)
        .orderBy(col("doc_id"))),

    // cross-source contamination matrix: 3-token-shingle Jaccard between
    // every source pair — "how much does dataset A duplicate dataset B"
    // before fixing mixture weights. Shingles go through the native hash
    // kernel (strings only exist transiently per row); the per-shingle
    // source set comes from ONE groupBy(sh) with a map-side-combining
    // collect_set — the oracle's declarative self-join would shuffle the
    // shingle stream twice more (distinct + both join sides; measured
    // ~2x slower). Pairs explode from each source set (bounded by
    // #sources, tiny); sizes roll up from the same materialized
    // grouping; never pairwise in docs. Hash collisions (~1e9 space)
    // affect both engines identically — the oracle mirrors the kernel.
    "q99_source_overlap" -> ((s, dir) => {
      graft.GraftFunctions.registerAll(s)
      val grouped = t(s, dir, "documents")
        .select(col("source"), explode(graft.operators.MinHashDedup
          .shingleHashesFromTokens(col("text"), 3)).as("sh"))
        .groupBy(col("sh"))
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .materialize() // sizes + pairs both read it; built once
      val sz = grouped.select(explode(col("srcs")).as("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      grouped.where(size(col("srcs")) >= 2)
        .select(explode(flatten(transform(col("srcs"), (a, i) =>
          transform(slice(col("srcs"), i + 2, size(col("srcs"))),
            b => struct(a.as("src1"), b.as("src2")))))).as("p"))
        .groupBy(col("p.src1").as("src1"), col("p.src2").as("src2"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sz.select(col("source").as("src1"), col("n").as("n1"))), "src1")
        .join(broadcast(sz.select(col("source").as("src2"), col("n").as("n2"))), "src2")
        // integer-exact 6-dp rounding (see round6): the union size can
        // carry 2^7+, where an exact .5e-6 tie rounds differently
        // across engines
        .select(col("src1"), col("src2"), col("n_shared"), col("n1"), col("n2"),
          round6(col("n_shared"),
            col("n1") + col("n2") - col("n_shared")).as("jaccard"))
        .orderBy(col("src1"), col("src2"))
    }),

    // benchmark decontamination: corpus docs sharing >= 2 distinct
    // shingle hashes with the eval set (stand-in: doc_id % 97 = 0) must
    // be dropped before training. Eval shingles are a broadcast set; the
    // probe is one equi-join — no pairwise anything, linear in corpus
    // size at 100 TB. Real pipelines window at 8-13 grams; the synthetic
    // corpus's short random texts only overlap at 3-grams, so the window
    // is a parameter, not a semantic.
    "q83_decontaminate" -> ((s, dir) => {
      graft.GraftFunctions.registerAll(s)
      // localCheckpoint: the tokenize+shingle pass is the dominant CPU
      // cost and BOTH consumers (eval broadcast set + probe side) read
      // it — without materialization it runs once per consumer
      // (same pattern as ContainmentDedup.pairsAuto / q113)
      val sh = t(s, dir, "documents").select(col("doc_id"),
        explode(graft.operators.MinHashDedup
          .shingleHashesFromTokens(col("text"), 3)).as("sh"))
        .materialize()
      val evalSet = sh.where(col("doc_id") % 97 === 0)
        .select(col("sh")).distinct()
      sh.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(evalSet), "sh")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy(col("doc_id"))
    }),

    // exact duplicated-span REMOVAL (Lee et al. substring dedup): every
    // 3-token span occurring >= 2 times in the corpus keeps only its
    // first (doc, pos) occurrence; covered tokens are cut and documents
    // reassemble. q86 measures this duplication; q104 removes it. The
    // oracle spells the identical owner rule declaratively — exact
    // text_clean equality pins the whole pipeline (positioned hashes,
    // owner election, greedy cover, reassembly) bit-for-bit.
    "q104_span_dedup" -> ((s, dir) =>
      graft.operators.SpanDedup.clean(t(s, dir, "documents"),
          "doc_id", "text", SpanK)
        .orderBy(col("doc_id"))),

    // incremental span dedup — q104's daily-increment sibling (the q91
    // contract for spans): the new batch cleans against the history
    // HASH STORE only; history text is never re-read, history never
    // re-paired. Split derived from the corpus like q91 (80% of max
    // doc_id, exact integer arithmetic, same scalar in the oracle).
    // The oracle is the FULL-corpus q104 rule restricted to new docs —
    // exact equality proves the store probe + batch owner election
    // compose to the global owner rule (ids are append-only monotone,
    // so a history hash's owner always precedes every new instance).
    "q105_span_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // coalesce(0): an empty table must yield an empty result, not an
      // NPE on the null max (the oracle's >= NULL degrades to empty too)
      val split = docs.agg(coalesce(max(col("doc_id")).cast("long"), lit(0L)))
        .head.getLong(0) * 8L / 10L
      // the store is PERSISTED state in production (built once as
      // history accumulates, probed by every increment) — cache it like
      // the ANN/BPE models so the steady-state cost benched/measured is
      // the probe, not a per-run history rebuild
      val store = spanStoreCache.getOrElseUpdate(dir,
        graft.ModelCheckpoint.pin(graft.operators.SpanDedup.hashStore(
          docs.where(col("doc_id") < split), "doc_id", "text", SpanK)))
      graft.operators.SpanDedup.cleanIncremental(
          docs.where(col("doc_id") >= split), "doc_id", "text", SpanK, store)
        ._1.orderBy(col("doc_id"))
    }),

    // per-document novelty: the fraction of a doc's distinct shingles
    // whose FIRST corpus occurrence (min doc_id) is this doc — the
    // marginal-contribution curve behind "is more of this source still
    // adding new content?" dataset-growth decisions. Shape: the novel
    // count per doc is firsts.groupBy(first_doc) — the (sh, doc) pairs
    // are NEVER joined back on the shingle, so a boilerplate shingle in
    // every doc is absorbed map-side by the min/count partial aggs (no
    // q86-style hot window partition; two keyed shuffles total).
    "q109_shingle_novelty" -> ((s, dir) => {
      graft.GraftFunctions.registerAll(s)
      // repartition BEFORE the per-row shingling: the table arrives as
      // few parquet splits and the hash work would run on as few cores
      // (MinHashDedup.signatures records the same lesson); the native
      // shingle_hashes combine is ~10x the char-rehashing spelling
      val pairs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(graft.operators.MinHashDedup
          .shingleHashesFromTokens(col("text"), NoveltyK)).as("sh"))
        .materialize() // two consumers; shingling is the wide scan
      val firsts = pairs.groupBy("sh").agg(min("doc_id").as("first_doc"))
      val novel = firsts.groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      pairs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          // integer-exact: per-doc distinct-shingle counts can carry 2^7
          round6(coalesce(col("n_novel"), lit(0L)), col("n_shingles"))
            .as("novel_frac"))
        .orderBy(col("doc_id"))
    }),

    // winnowing fingerprints (MOSS): per-window minimum selection keeps
    // ~2/(w+1) of the shingle hashes yet guarantees any shared run of
    // >= w+k-1 tokens shares a fingerprint. Native O(n) deque kernel per
    // row; the cross-doc share stats are the inverted-index shape over
    // the SELECTED subset only (operators.Winnowing scaladoc).
    "q112_winnow_fingerprint" -> ((s, dir) =>
      graft.operators.Winnowing.stats(
          t(s, dir, "documents"), "doc_id", "text", WinnowK, WinnowW)
        .orderBy(col("doc_id"))),

    // containment (subset-duplicate) detection: |A ∩ B| / min(|A|,|B|)
    // over distinct shingle sets — fires at 1.0 when one doc's content
    // is fully covered by another, the case symmetric Jaccard dilutes.
    // Inverted-index self-join on the shingle hash (uncapped here; the
    // operator's maxDocFreq guards degenerate boilerplate keys at scale)
    // pairsAuto: the census-based chooser (SCALE.md round-5 study) —
    // on this closed-vocabulary corpus it measures ratio≈1 and picks
    // the naive count-agg join, the measured winner at oracle scale;
    // the same call flips to the prefix filter on sparse web corpora
    // above the join-volume floor.
    "q113_dedup_containment" -> ((s, dir) =>
      graft.operators.ContainmentDedup.pairsAuto(
          t(s, dir, "documents"), "doc_id", "text",
          shingleK = 2, minContainment = ContainMin)
        .orderBy(col("doc1"), col("doc2"))),

    // edit-distance-verified near-dup: the VERIFY stage after LSH —
    // MinHash banding proposes candidates (same params as q66), then
    // relative Levenshtein distance confirms or rejects each pair.
    // The quadratic-cost distance runs ONLY on candidate pairs, never
    // corpus-wide; texts join to the pair list through broadcast hash
    // joins (pairs << corpus at any scale). r13: candidates are CENSUS-
    // GOVERNED (candidatePairsAuto) — static banding let the per-doc
    // candidate count drift up with df saturation (Zipf 200k: wall 2.9x
    // at 2x docs, candidate-driven), so the bucket-size histogram now
    // picks a hot-bucket cap that bounds admitted band pairs to
    // EditVerifyBudget per doc; the oracle spells the same cap rule.
    "q114_dedup_editverify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.MinHashDedup.candidatePairsAuto(
        docs, "doc_id", "text", shingleK = 2, numHashes = MinHashK,
        bands = Bands, budgetPairsPerDoc = EditVerifyBudget)
      val a = docs.select(col("doc_id").as("doc1"), col("text").as("t1"))
      val b = docs.select(col("doc_id").as("doc2"), col("text").as("t2"))
      val den = greatest(length(col("t1")), length(col("t2")))
      val candidates = pairs
        .hint("broadcast").join(a, Seq("doc1")).hint("broadcast").join(b, Seq("doc2"))
        // exact length-difference lower bound: lev >= |len1-len2| and
        // round6 is monotone in the numerator, so the rounded guard
        // keeps every pair the rounded rel_dist filter could keep —
        // candidates from wildly different-length texts never pay the
        // quadratic distance
        .where(round6(abs(length(col("t1")) - length(col("t2"))), den) <= EditRelMax)
        // the broadcast joins leave candidates in the corpus scan's few
        // file partitions, and WITHOUT the barrier below Catalyst pushes
        // the rel_dist predicate (lev substituted in) back through the
        // repartition into those partitions — the checkpoint pins the
        // O(len^2) verify ABOVE the exchange, spread across the cluster
        // (measured 3.2 -> 0.6 s at sf0.1: ~300M matrix cells on one
        // core otherwise). The frame is pairs+texts — small by the same
        // pairs << corpus argument that justifies the broadcasts.
        .repartition(s.sparkContext.defaultParallelism)
        .materialize()
      candidates
        .withColumn("dist", levenshtein(col("t1"), col("t2")))
        // den = max(len) <= ~600 chars on this corpus but unbounded in
        // general: integer-exact rounding, same rule as q97/q86
        .withColumn("rel_dist", round6(col("dist"), den))
        .where(col("rel_dist") <= EditRelMax)
        .select(col("doc1"), col("doc2"), col("dist"), col("rel_dist"))
        .orderBy(col("doc1"), col("doc2"))
    }),

    // the PRODUCTION-recommended near-dup fingerprint path (r12 study:
    // unweighted 32-bit SimHash saturates on open-vocabulary corpora —
    // 40% of ALL pairs at hd<=2; idf-weighted 64-bit recovers the
    // planted population): Manku WWW'07 configuration over documents.
    // Rows-only — the signature is engine-specific; q173b is the
    // oracle-exact semantics twin (q80/q80b pattern).
    "q173_weighted_simhash" -> ((s, dir) =>
      graft.operators.SimHashDedup.weightedCandidatePairs64(
          t(s, dir, "documents"), "doc_id", "text", maxHd = 3)
        .orderBy(col("doc1"), col("doc2"))),

    // q173's oracle twin: structurally-derivable outputs only — an
    // exact duplicate and an order-permuted multiset both produce
    // IDENTICAL weighted fingerprints (token-multiset invariance ->
    // hd 0, hash-independent), while disjoint-vocabulary docs sit ~32
    // bits apart; the VALUES oracle pins exactly the two hd-0 pairs
    "q173b_weighted_simhash_fixture" -> ((s, dir) => {
      import s.implicits._
      val docs = Seq(
        (0L, "zephyr quasar nimbus oracle krypton fjord glacier obsidian"),
        (1L, "zephyr quasar nimbus oracle krypton fjord glacier obsidian"),
        (2L, "amber beacon cobalt dynamo ember falcon garnet harbor"),
        (3L, "harbor garnet falcon ember dynamo cobalt beacon amber"),
        (4L, "tundra velvet walnut xylem yonder zircon attic bramble"),
        (5L, "cipher delta echo foxtrot golf hotel india juliet"))
        .toDF("doc_id", "text")
      graft.operators.SimHashDedup.weightedCandidatePairs64(
          docs, "doc_id", "text", maxHd = 3)
        .select(col("doc1"), col("doc2"), col("hd").cast("long").as("hd"))
        .orderBy(col("doc1"), col("doc2"))
    }),

    // bloom-prefiltered cross-corpus exact dedup: which docs of the new
    // batch (top 20% of ids, the q91 split) are genuinely NEW against
    // history, by content fingerprint. Bloom misses short-circuit
    // map-side (no false negatives); only hits reach the exact
    // anti-join. Results are exact — the oracle is the plain NOT IN.
    "q115_dedup_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val split = docs.agg(coalesce(max(col("doc_id")).cast("long"), lit(0L)))
        .head.getLong(0) * 8L / 10L
      graft.operators.BloomDedup.newDocs(
          docs.where(col("doc_id") < split),
          docs.where(col("doc_id") >= split),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // sorted-neighborhood (merge/purge) near-dup: the skew-proof third
    // blocking family — candidates are O(w·n) no matter how degenerate
    // the key distribution, at the cost of sort-adjacency recall
    // (operators/SortedNeighborhood scaladoc). Key = lang + the doc's
    // first two tokens; exact Jaccard verify, q65's threshold.
    "q127_dedup_sortneighbor" -> ((s, dir) => {
      val key = concat_ws("|", col("lang"),
        array_join(slice(graft.functions.TextFunctions.tokens(col("text")),
          1, 2), " "))
      graft.operators.SortedNeighborhood.pairs(
          t(s, dir, "documents"), "doc_id", "text",
          key, w = SnmW, minJaccard = 0.5)
        .orderBy(col("doc1"), col("doc2"))
    }),

    // CCNet-style LINE-level dedup (the web-corpus boilerplate pass:
    // hash every line, drop lines whose corpus frequency crosses a
    // threshold, keep the rest in order). The synthetic docs have no
    // newlines, so a "line" here is a non-overlapping LineW-word chunk —
    // the same shape at the same cost. Lines shared by >= LineDupDocs
    // distinct docs are removed from EVERY doc; the cleaned text
    // reassembles in position order (docs whose every line is common
    // come back empty, not dropped). Scale: the common-line table is
    // small by construction (boilerplate), so the removal join
    // broadcasts; the explode is linear in corpus words.
    "q158_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lines = docs.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(ceil(size(split(text, ' ')) / ${LineW}.0) AS int) - 1),
             | i -> array_join(slice(split(text, ' '), i * $LineW + 1, $LineW), ' '))"""
            .stripMargin.replace("\n", ""))).as(Seq("pos", "line")))
      val common = lines.groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .where(col("n_docs") >= LineDupDocs)
        .select(col("line"))
      // ONE flag-join pass (not an anti-join + separate totals join):
      // totals, kept counts, and the reassembled text all come from a
      // single grouped aggregation over the flagged lines — two corpus
      // scans total (counting pass + this one), the two-pass minimum
      // for a global-frequency filter
      val flagged = lines.join(
        broadcast(common.withColumn("dup", lit(true))), Seq("line"), "left")
      flagged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("total_lines"),
          sum(when(col("dup").isNull, 1L).otherwise(0L)).as("kept_lines"),
          array_join(transform(filter(array_sort(collect_list(struct(
              col("pos"), col("line"),
              coalesce(col("dup"), lit(false)).as("dup")))),
            x => !x.getField("dup")),
            x => x.getField("line")), " ").as("cleaned"))
        .select(col("doc_id"), col("kept_lines"),
          (col("total_lines") - col("kept_lines")).as("removed_lines"),
          col("cleaned"))
        .orderBy(col("doc_id"))
    })
  )

  // 3-word "lines", removed when shared by >= 2 distinct docs — tuned so
  // the synthetic corpus (small vocab) actually exercises the removal
  private val LineW = 3
  private val LineDupDocs = 2

  /** q109 shingle width (3-gram, same granularity as the q99 source
    * overlap matrix — fine enough to overlap across the synthetic
    * corpus, coarse enough to mean copied phrasing). */
  private val NoveltyK = 3

  /** q104 span width (3: the synthetic corpus's short random texts only
    * collide at small k — real pipelines run 50-token windows; the
    * width is a parameter, not a semantic). */
  private val SpanK = 3

  /** q112 winnowing: 3-token shingles, window 4 → any shared 6-token run
    * guarantees a shared fingerprint at ~40% selection density. */
  private val WinnowK = 3
  private val WinnowW = 4

  /** q113: 2-token shingles (q66's granularity); 0.8 = "at least 80% of
    * the smaller doc's shingles occur in the other" — the
    * subset-duplicate band. */
  private val ContainMin = 0.8

  /** q114: confirm a candidate pair when edits cover at most 60% of the
    * longer text — loose enough to keep the LSH-found rewrites, tight
    * enough to reject coincidental band collisions. */
  private val EditRelMax = 0.6

  /** q114: admitted band pairs per doc — the census governor's budget
    * (MinHashDedup.candidatePairsAuto scaladoc for the rationale). */
  private[graft] val EditVerifyBudget = 2

  private val toks = "string_split_regex(trim(text), '\\s+')"

  // q127 sorted-neighborhood window width (the classic small constant;
  // multi-pass over several keys is the recall lever, not a bigger w)
  private val SnmW = 4

  /** Shared CTE chain ending in `pairs(doc1, doc2)` — the MinHash LSH
    * candidate pairs, spelled once for q66 (direct) and q75 (cluster
    * closure over the same pairs). */
  private lazy val minhashPairsCtes: String = {
    val hashes = graft.operators.MinHashDedup.shingleHashesFromTokensSql("text", 2)
    val sig = minhashSignatureSql("hs", MinHashK)
    val bandRows = (0 until Bands).map(bnd =>
      s"SELECT doc_id, $bnd AS band, array_to_string(list_slice(sig, " +
        s"${bnd * RowsPerBand + 1}, ${(bnd + 1) * RowsPerBand}), ',') AS key FROM sigs")
      .mkString(" UNION ALL ")
    s"""hsx AS (SELECT doc_id, $hashes AS hs FROM documents),
       |sigs AS (SELECT doc_id, $sig AS sig FROM hsx),
       |bands AS ($bandRows),
       |pairs AS (SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** CTE chain ending in `pairs(doc1, doc2)` under the CENSUS-GOVERNED
    * hot-bucket cap — the exact rule MinHashDedup.bandCensus implements:
    * cap = NULL (uncapped) when the full within-bucket pair volume fits
    * budget·n; else the largest bucket size whose inclusive ascending
    * prefix volume fits, floored at 2. Spelled for q114's oracle so the
    * governed operator stays hash-exact against DuckDB. */
  private def minhashGovernedPairsCtes(budgetPerDoc: Int): String = {
    val hashes = graft.operators.MinHashDedup.shingleHashesFromTokensSql("text", 2)
    val sig = minhashSignatureSql("hs", MinHashK)
    val bandRows = (0 until Bands).map(bnd =>
      s"SELECT doc_id, $bnd AS band, array_to_string(list_slice(sig, " +
        s"${bnd * RowsPerBand + 1}, ${(bnd + 1) * RowsPerBand}), ',') AS key FROM sigs")
      .mkString(" UNION ALL ")
    s"""hsx AS (SELECT doc_id, $hashes AS hs FROM documents),
       |sigs AS (SELECT doc_id, $sig AS sig FROM hsx),
       |bands AS ($bandRows),
       |bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
       |hist AS (SELECT n, COUNT(*) AS k FROM bsz WHERE n >= 2 GROUP BY n),
       |capsel AS (SELECT CASE
       |    WHEN COALESCE((SELECT SUM(k*n*(n-1)//2) FROM hist), 0)
       |         <= $budgetPerDoc * (SELECT COUNT(*) FROM documents) THEN NULL
       |    ELSE GREATEST(2, COALESCE((
       |      SELECT MAX(n) FROM (
       |        SELECT n, SUM(k*n*(n-1)//2) OVER (ORDER BY n) AS cum FROM hist) t
       |      WHERE cum <= $budgetPerDoc * (SELECT COUNT(*) FROM documents)), 2))
       |  END AS cap),
       |kept AS (SELECT b.doc_id, b.band, b.key FROM bands b
       |  JOIN bsz USING (band, key), capsel c
       |  WHERE c.cap IS NULL OR bsz.n <= c.cap),
       |pairs AS (SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM kept x JOIN kept y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q64_dedup_exact" ->
      s"""SELECT array_to_string(list_slice($toks, 1, 3), ' ') AS key3,
         |  MIN(doc_id) AS keeper, COUNT(*) AS n_copies
         |FROM documents GROUP BY key3 HAVING COUNT(*) > 1 ORDER BY key3""".stripMargin,

    "q65_dedup_jaccard" ->
      s"""WITH d AS (SELECT doc_id, lang, len($toks) AS n_tokens,
         |             list_distinct($toks) AS tk FROM documents)
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |  round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.tk, b.tk))), 6) AS jaccard
         |FROM d a JOIN d b ON a.lang = b.lang AND a.n_tokens = b.n_tokens
         |  AND a.doc_id < b.doc_id
         |WHERE round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.tk, b.tk))), 6) >= 0.5
         |ORDER BY doc1, doc2""".stripMargin,

    "q66_dedup_minhash" ->
      s"WITH $minhashPairsCtes\nSELECT doc1, doc2 FROM pairs ORDER BY doc1, doc2",

    // the incremental path must lose nothing vs the full-corpus pairs
    // restricted to new doc2 — the oracle IS that restriction
    "q91_dedup_incremental" ->
      (s"WITH $minhashPairsCtes\nSELECT doc1, doc2 FROM pairs " +
        "WHERE doc2 >= (SELECT MAX(doc_id) * 8 // 10 FROM documents) " +
        "ORDER BY doc1, doc2"),

    // transitive closure via recursive CTE (unbounded reachability) — if
    // the Spark-side star contraction stopped short of the fixpoint, the
    // component minima here would differ
    "q75_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT doc1 AS s, doc2 AS d FROM pairs
         |          UNION ALL SELECT doc2, doc1 FROM pairs),
         |reach(n, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.n),
         |comp AS (SELECT n AS node, MIN(r) AS component FROM reach GROUP BY n)
         |SELECT d.doc_id AS doc_id,
         |  coalesce(c.component, d.doc_id) AS cluster_id,
         |  CAST(coalesce(c.component, d.doc_id) = d.doc_id AS INT) AS is_keeper
         |FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
         |ORDER BY doc_id""".stripMargin,

    // same recursive closure as q75, then the split CASE on the
    // component id — if any cluster straddled two splits, the
    // per-doc rows here would differ
    "q100_leakfree_split" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT doc1 AS s, doc2 AS d FROM pairs
         |          UNION ALL SELECT doc2, doc1 FROM pairs),
         |reach(n, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.n),
         |comp AS (SELECT n AS node, MIN(r) AS component FROM reach GROUP BY n),
         |cl AS (SELECT d.doc_id AS doc_id,
         |         coalesce(c.component, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ((cluster_id % 1000003) * 2654435761) % 1000 < 900 THEN 'train'
         |       WHEN ((cluster_id % 1000003) * 2654435761) % 1000 < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM cl ORDER BY doc_id""".stripMargin,

    // same pair set + same closure clustering as q100; the audit just
    // scores each edge under the per-doc and per-cluster split rules
    "q168_split_leak_audit" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT doc1 AS s, doc2 AS d FROM pairs
         |          UNION ALL SELECT doc2, doc1 FROM pairs),
         |reach(n, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.n),
         |comp AS (SELECT n AS node, MIN(r) AS component FROM reach GROUP BY n),
         |spl AS (SELECT d.doc_id,
         |    ${oSplitOf("d.doc_id")} AS dsplit,
         |    ${oSplitOf("coalesce(c.component, d.doc_id)")} AS csplit
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
         |a AS (SELECT s1.dsplit AS d1, s2.dsplit AS d2,
         |    s1.csplit AS c1, s2.csplit AS c2
         |  FROM pairs p JOIN spl s1 ON s1.doc_id = p.doc1
         |  JOIN spl s2 ON s2.doc_id = p.doc2),
         |r AS (SELECT 'cluster_hash' AS rule,
         |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN c1 <> c2 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_cross
         |  FROM a
         |  UNION ALL
         |  SELECT 'doc_hash', CAST(COUNT(*) AS BIGINT),
         |    CAST(COALESCE(SUM(CASE WHEN d1 <> d2 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT)
         |  FROM a)
         |SELECT rule, n_pairs, n_cross,
         |  CASE WHEN n_pairs = 0 THEN 0.0
         |    ELSE ${oRound6("n_cross", "n_pairs")} END AS leak_frac
         |FROM r ORDER BY rule""".stripMargin,

    // deliberately UNBLOCKED brute force: if the Spark-side band blocking
    // lost any hd<=6 pair, this oracle would catch it
    "q67_dedup_simhash" ->
      s"""WITH d AS (SELECT doc_id, ${simhashSql("text")} AS sh FROM documents)
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |  bit_count(xor(a.sh, b.sh)) AS hd
         |FROM d a JOIN d b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 2
         |ORDER BY doc1, doc2""".stripMargin,

    "q86_dedup_passages" ->
      s"""WITH sh AS (SELECT doc_id, unnest(${graft.operators.MinHashDedup
             .shingleHashesFromTokensSql("text", PassageK)}) AS sh
         |  FROM documents),
         |f AS (SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS nd FROM sh)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         |  CAST(COUNT(*) FILTER (WHERE nd >= 2) AS BIGINT) AS n_dup,
         |  ${oRound6("COUNT(*) FILTER (WHERE nd >= 2)", "COUNT(*)")}
         |    AS dup_frac
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical owner rule spelled declaratively: positioned span
    // hashes -> corpus frequency + min-(doc,pos) owner -> non-owner
    // positions of duplicated spans -> greedy token cover -> reassembly
    "q104_span_dedup" ->
      s"""WITH d AS (SELECT doc_id, $toks AS toksl FROM documents),
         |sh AS (SELECT doc_id, u.pos, u.h FROM d,
         |  UNNEST(list_transform(generate_series(1, greatest(len(toksl) - ${SpanK - 1}, 0)), i ->
         |    struct_pack(pos := i, h := ${tokenHashSql(
                  s"array_to_string(list_slice(toksl, i, i + ${SpanK - 1}), ' ')")}))) AS t(u)),
         |freq AS (SELECT h, COUNT(*) AS f,
         |    MIN(struct_pack(doc := doc_id, p := pos)) AS owner
         |  FROM sh GROUP BY h),
         |dup AS (SELECT doc_id, list_sort(list(pos)) AS dup_starts
         |  FROM sh JOIN freq USING (h)
         |  WHERE f >= 2 AND NOT (owner.doc = sh.doc_id AND owner.p = sh.pos)
         |  GROUP BY doc_id),
         |clean AS (SELECT d.doc_id, len(toksl) AS n_tokens,
         |    list_filter(list_transform(toksl, (t, i) -> struct_pack(t := t, i := i)),
         |      x -> len(list_filter(COALESCE(dup_starts, []),
         |        s -> s <= x.i AND x.i < s + $SpanK)) = 0) AS keptoks
         |  FROM d LEFT JOIN dup ON d.doc_id = dup.doc_id)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_tokens - len(keptoks) AS BIGINT) AS n_removed,
         |  COALESCE(array_to_string(list_transform(keptoks, x -> x.t), ' '), '')
         |    AS text_clean
         |FROM clean ORDER BY doc_id""".stripMargin,

    // the full-corpus owner rule restricted to the new batch: exact
    // equality proves the incremental store-probe composition
    "q105_span_dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id, $toks AS toksl FROM documents),
         |sh AS (SELECT doc_id, u.pos, u.h FROM d,
         |  UNNEST(list_transform(generate_series(1, greatest(len(toksl) - ${SpanK - 1}, 0)), i ->
         |    struct_pack(pos := i, h := ${tokenHashSql(
                  s"array_to_string(list_slice(toksl, i, i + ${SpanK - 1}), ' ')")}))) AS t(u)),
         |freq AS (SELECT h, COUNT(*) AS f,
         |    MIN(struct_pack(doc := doc_id, p := pos)) AS owner
         |  FROM sh GROUP BY h),
         |dup AS (SELECT doc_id, list_sort(list(pos)) AS dup_starts
         |  FROM sh JOIN freq USING (h)
         |  WHERE f >= 2 AND NOT (owner.doc = sh.doc_id AND owner.p = sh.pos)
         |  GROUP BY doc_id),
         |clean AS (SELECT d.doc_id, len(toksl) AS n_tokens,
         |    list_filter(list_transform(toksl, (t, i) -> struct_pack(t := t, i := i)),
         |      x -> len(list_filter(COALESCE(dup_starts, []),
         |        s -> s <= x.i AND x.i < s + $SpanK)) = 0) AS keptoks
         |  FROM d LEFT JOIN dup ON d.doc_id = dup.doc_id)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_tokens - len(keptoks) AS BIGINT) AS n_removed,
         |  COALESCE(array_to_string(list_transform(keptoks, x -> x.t), ' '), '')
         |    AS text_clean
         |FROM clean
         |WHERE doc_id >= (SELECT (MAX(doc_id) * 8) // 10 FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q96_dedup_paragraphs" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS toksl FROM documents),
         |seg AS (SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
         |               array_to_string(list_slice(toksl, i*8+1, i*8+8), ' ') AS seg
         |        FROM tok, UNNEST(range(CAST(ceil(len(toksl)/8.0) AS BIGINT))) AS u(i)),
         |df AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY seg),
         |j AS (SELECT s.doc_id, s.seg_idx, s.seg, d.df FROM seg s JOIN df d USING (seg))
         |SELECT doc_id, COUNT(*) AS n_segs,
         |  CAST(COUNT(*) FILTER (WHERE df < 2) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE df < 2), '')
         |    AS text_clean
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q99_source_overlap" ->
      s"""WITH sh AS (SELECT DISTINCT source, unnest(${graft.operators.MinHashDedup
             .shingleHashesFromTokensSql("text", 3)}) AS sh FROM documents),
         |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
         |ov AS (SELECT a.source AS src1, b.source AS src2, COUNT(*) AS n_shared
         |       FROM sh a JOIN sh b USING (sh) WHERE a.source < b.source GROUP BY 1, 2)
         |SELECT src1, src2, n_shared, s1.n AS n1, s2.n AS n2,
         |  ${oRound6("n_shared", "s1.n + s2.n - n_shared")} AS jaccard
         |FROM ov JOIN sz s1 ON s1.source = ov.src1 JOIN sz s2 ON s2.source = ov.src2
         |ORDER BY src1, src2""".stripMargin,

    "q83_decontaminate" -> {
      val sh3 = graft.operators.MinHashDedup.shingleHashesFromTokensSql("text", 3)
      s"""WITH sh AS (SELECT doc_id, unnest($sh3) AS sh FROM documents),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
         |SELECT doc_id, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_shared
         |FROM sh JOIN ev USING (sh)
         |WHERE doc_id % 97 <> 0
         |GROUP BY doc_id HAVING COUNT(DISTINCT sh) >= 2
         |ORDER BY doc_id""".stripMargin
    },

    "q109_shingle_novelty" ->
      s"""WITH p AS (SELECT doc_id, unnest(${graft.operators.MinHashDedup
             .shingleHashesFromTokensSql("text", NoveltyK)}) AS sh FROM documents),
         |f AS (SELECT sh, MIN(doc_id) AS first_doc FROM p GROUP BY sh),
         |nv AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
         |       FROM f GROUP BY first_doc),
         |pd AS (SELECT doc_id, COUNT(*) AS n_shingles FROM p GROUP BY doc_id)
         |SELECT pd.doc_id, n_shingles, COALESCE(n_novel, 0) AS n_novel,
         |  ${oRound6("COALESCE(n_novel, 0)", "n_shingles")} AS novel_frac
         |FROM pd LEFT JOIN nv ON pd.doc_id = nv.doc_id
         |ORDER BY pd.doc_id""".stripMargin,

    // winnowing spelled literally: per-window list_min over slices of
    // the positional hash list, then distinct — the O(n·w) reference
    // form the native deque kernel must equal
    "q112_winnow_fingerprint" ->
      s"""WITH ph AS (SELECT doc_id, ${graft.operators.MinHashDedup
             .shingleHashesPosFromTokensSql("text", WinnowK)} AS ph FROM documents),
         |fp AS (SELECT doc_id, len(ph) AS n_shingles,
         |  list_distinct(list_transform(
         |    generate_series(1, greatest(len(ph) - ${WinnowW - 1}, 1)),
         |    j -> list_min(list_slice(ph, j, j + ${WinnowW - 1})))) AS fps FROM ph),
         |ex AS (SELECT doc_id, n_shingles, len(fps) AS n_fp, unnest(fps) AS fp FROM fp),
         |cnt AS (SELECT fp, COUNT(*) AS n_docs FROM ex GROUP BY fp)
         |SELECT ex.doc_id AS doc_id, any_value(ex.n_shingles) AS n_shingles,
         |  any_value(ex.n_fp) AS n_fp,
         |  CAST(COUNT(*) FILTER (WHERE cnt.n_docs >= 2) AS BIGINT) AS n_shared_fp
         |FROM ex JOIN cnt USING (fp)
         |GROUP BY ex.doc_id ORDER BY doc_id""".stripMargin,

    // uncapped inverted-index containment join — the exact semantics the
    // operator's maxDocFreq=0 path must reproduce
    "q113_dedup_containment" ->
      s"""WITH hs AS (SELECT doc_id, ${graft.operators.MinHashDedup
             .shingleHashesFromTokensSql("text", 2)} AS hs FROM documents),
         |ex AS (SELECT doc_id, len(hs) AS n, unnest(hs) AS sh FROM hs)
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common,
         |  ${oRound6("COUNT(*)", "least(a.n, b.n)")} AS containment
         |FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n, b.n
         |HAVING ${oRound6("COUNT(*)", "least(a.n, b.n)")} >= $ContainMin
         |ORDER BY doc1, doc2""".stripMargin,

    // census-governed LSH candidates verified by relative Levenshtein
    "q114_dedup_editverify" ->
      s"""WITH ${minhashGovernedPairsCtes(EditVerifyBudget)}
         |SELECT p.doc1, p.doc2, levenshtein(a.text, b.text) AS dist,
         |  ${oRound6("levenshtein(a.text, b.text)",
                      "greatest(length(a.text), length(b.text))")} AS rel_dist
         |FROM pairs p JOIN documents a ON a.doc_id = p.doc1
         |  JOIN documents b ON b.doc_id = p.doc2
         |WHERE ${oRound6("levenshtein(a.text, b.text)",
                      "greatest(length(a.text), length(b.text))")} <= $EditRelMax
         |ORDER BY doc1, doc2""".stripMargin,

    // q173 itself stays rows-only (64-bit engine-specific signatures);
    // this twin pins the weighted path's SEMANTICS: multiset-identical
    // docs at hd 0, disjoint-vocab docs unpaired
    "q173b_weighted_simhash_fixture" ->
      """SELECT * FROM (VALUES (0, 1, 0), (2, 3, 0))
        |AS fx(doc1, doc2, hd) ORDER BY doc1, doc2""".stripMargin,

    // the prefilter-free spelling: plain fingerprint anti-join on the
    // q91 corpus-derived split
    "q115_dedup_bloom" ->
      s"""WITH s AS (SELECT MAX(doc_id) * 8 // 10 AS v FROM documents),
         |hist AS (SELECT DISTINCT ${graft.functions.TextFunctions
             .charFingerprintSql("text")} AS fp
         |         FROM documents WHERE doc_id < (SELECT v FROM s))
         |SELECT doc_id, ${graft.functions.TextFunctions
             .charFingerprintSql("text")} AS fp
         |FROM documents
         |WHERE doc_id >= (SELECT v FROM s)
         |  AND fp NOT IN (SELECT fp FROM hist)
         |ORDER BY doc_id""".stripMargin,

    "q127_dedup_sortneighbor" ->
      s"""WITH d AS (SELECT doc_id, lang, $toks AS tk0 FROM documents),
         |k AS (SELECT doc_id, list_distinct(tk0) AS tk,
         |    lang || '|' || array_to_string(tk0[1:2], ' ') AS key FROM d),
         |r AS (SELECT doc_id, tk,
         |    ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn FROM k),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
         |    len(list_intersect(a.tk, b.tk)) AS i,
         |    len(list_distinct(list_concat(a.tk, b.tk))) AS u
         |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + $SnmW)
         |SELECT LEAST(d1, d2) AS doc1, GREATEST(d1, d2) AS doc2,
         |  ${oRound6("i", "u")} AS jaccard
         |FROM p WHERE ${oRound6("i", "u")} >= 0.5
         |ORDER BY doc1, doc2""".stripMargin,

    "q158_line_dedup" ->
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |),
         |lines AS (
         |  SELECT doc_id, r.pos,
         |    array_to_string(w[(r.pos * $LineW + 1):(r.pos * $LineW + $LineW)], ' ') AS line
         |  FROM docs,
         |    UNNEST(range(0, CAST(ceil(len(w) / ${LineW}.0) AS int))) AS r(pos)
         |),
         |common AS (
         |  SELECT line FROM lines GROUP BY line
         |  HAVING COUNT(DISTINCT doc_id) >= $LineDupDocs
         |),
         |kept AS (
         |  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM common)
         |),
         |tot AS (SELECT doc_id, COUNT(*) AS total_lines FROM lines GROUP BY doc_id),
         |ka AS (
         |  SELECT doc_id, COUNT(*) AS kept_lines,
         |    string_agg(line, ' ' ORDER BY pos) AS cleaned
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, COALESCE(ka.kept_lines, 0) AS kept_lines,
         |  t.total_lines - COALESCE(ka.kept_lines, 0) AS removed_lines,
         |  COALESCE(ka.cleaned, '') AS cleaned
         |FROM tot t LEFT JOIN ka USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
  )
}
