package graft.pipelines

import graft.SparkSpec

/** End-to-end corpus preparation: each gate must act (quality, exact
  * dedup, near-dup transitive dedup, mixture), survivors are the
  * deterministic min-id keepers, and the whole run is reproducible.
  */
class CorpusPipelineSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (1L, base, "web"),
      (2L, base.replace("today", "tonight"), "web"), // near-dup of 1
      (3L, base.replace("today", "tonite"), "web"),  // near-dup of 2 (chain)
      (4L, "spark shuffles partition data across executors during wide transformations", "web"),
      (5L, "columnar parquet storage enables efficient predicate pushdown and pruning", "books"),
      (6L, "watermarks bound state retention in streaming aggregation pipelines always", "books"),
      (7L, "minhash signatures approximate jaccard similarity between shingle sets", "books"),
      (8L, "the quick brown fox jumps over seven happy dogs by the river delta", "books"),
      (9L, "tiny", "web"), // fails minTokens
      (10L, "spark shuffles partition data across executors during wide transformations", "web") // exact dup of 4 (same 3-token prefix)
    ).toDF("doc_id", "text", "source")
  }

  test("quality, exact-dup, near-dup-chain and mixture gates all act; run is deterministic") {
    val cfg = CorpusPipeline.Config(minTokens = 5, minQuality = 0.0,
      numHashes = 16, bands = 8)
    val out = CorpusPipeline.run(corpus(), "doc_id", "text", "source", cfg)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(!kept.contains(9L), "minTokens gate missed")
    assert(!kept.contains(10L), "exact-dup loser survived")
    // near-dup chain 1-2-3: transitive clustering keeps only doc 1
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L),
      s"chain dedup wrong: $kept")
    // survivors carry their cluster id (min of component)
    val c1 = out.where(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .select("cluster_id").head().getLong(0)
    assert(c1 == 1L)

    val again = CorpusPipeline.run(corpus(), "doc_id", "text", "source", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept, "pipeline not deterministic")
  }

  test("normalization collapses runs and boilerplate segments vanish; off by default") {
    import spark.implicits._
    // exactly 8 tokens = one full segment, so after removal the two docs
    // share NOTHING (a shared residue could near-dup-cluster them later)
    val boiler = "subscribe to our newsletter for more updates today"
    val docs = Seq(
      // consecutive-duplicate run that normalization must collapse
      (1L, "data data data pipelines shuffle tokens across wide executor stages", "web"),
      // two docs sharing an 8-token boilerplate prefix segment
      (2L, s"$boiler columnar scans prune unread pages quickly", "web"),
      (3L, s"$boiler watermark state bounds streaming aggregation memory", "web"),
      // pure-boilerplate docs: reduced to "" and must NOT reach the
      // output even with minTokens=1 (tokens("") is [""], size 1 — the
      // minTokens gate alone would let them through)
      (4L, boiler, "web"),
      (5L, boiler, "web")
    ).toDF("doc_id", "text", "source")
    val base = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      numHashes = 16, bands = 8)

    // defaults: both stages off — texts pass through untouched
    val off = CorpusPipeline.run(docs, "doc_id", "text", "source", base)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(off(1L).startsWith("data data data"), "normalization must default off")
    assert(off(2L).startsWith("subscribe"), "boilerplate removal must default off")

    val on = CorpusPipeline.run(docs, "doc_id", "text", "source",
        base.copy(minTokens = 1, normalizeTokens = true, dropBoilerplate = true))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the run collapsed to one token; the doc survives with shorter text
    assert(on(1L).startsWith("data pipelines"), s"run not collapsed: ${on(1L)}")
    // the shared 8-token segment is gone from both docs; unique tails stay
    assert(!on(2L).contains("subscribe") && on(2L).contains("columnar"),
      s"boilerplate kept: ${on(2L)}")
    assert(!on(3L).contains("subscribe") && on(3L).contains("watermark"),
      s"boilerplate kept: ${on(3L)}")
    // pure-boilerplate docs vanish entirely (empty-text backstop)
    assert(!on.contains(4L) && !on.contains(5L), s"empty docs leaked: $on")
  }

  test("classifier gate and decontamination drop their targets; off by default") {
    import spark.implicits._
    val docs = Seq(
      (1L, "columnar storage engines favor late materialization strategies overall", "web"),
      (2L, "watermarks bound state retention in streaming aggregation pipelines always", "web"),
      // verbatim copy of an eval-set prompt inside a longer doc
      (3L, "prefix words here the secret benchmark question text appears verbatim", "web"),
      // contaminated overlap SPANNING a URL: the corpus side is
      // PII-scrubbed before decon, so the eval side must be scrubbed
      // identically or every URL-touching shingle hash diverges and the
      // doc survives (all 3 shared shingles touch the URL here)
      (4L, "prefix filler words key at http://leak.example/x is forty plus trailing tokens", "web")
    ).toDF("doc_id", "text", "source")
    val evalSet = Seq(
      "the secret benchmark question text appears verbatim",
      "key at http://leak.example/x is forty").toDF("text")
    val base = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      numHashes = 16, bands = 8)

    // defaults: both stages off, everything survives
    val all = CorpusPipeline.run(docs, "doc_id", "text", "source", base)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L, 4L))

    // decontamination drops doc 3 (plain overlap) AND doc 4 (overlap
    // spanning a scrubbed URL — pins eval-side scrub symmetry)
    val decon = CorpusPipeline.run(docs, "doc_id", "text", "source", base,
        evalTexts = Some(evalSet))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(decon == Set(1L, 2L), s"decontamination wrong: $decon")

    // classifier with all-negative weights rejects everything; with
    // all-positive weights it keeps everything (threshold 0)
    val neg = CorpusPipeline.run(docs, "doc_id", "text", "source",
      base.copy(classifierWeights = Some(Seq.fill(64)(-1.0))))
    assert(neg.count() == 0)
    val pos = CorpusPipeline.run(docs, "doc_id", "text", "source",
        base.copy(classifierWeights = Some(Seq.fill(64)(1.0))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pos == Set(1L, 2L, 3L, 4L))
  }

  test("PII scrub masks text before it is kept; repetition gates drop degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice@example.com about the quarterly report draft tomorrow", "web"),
      (2L, "spam spam spam spam spam spam spam spam spam spam", "web"), // top-token 1.0
      (3L, "go stop go stop go stop go stop go stop go stop", "web"),   // dup bigrams
      (4L, "columnar storage engines favor late materialization strategies overall", "web")
    ).toDF("doc_id", "text", "source")
    val cfg = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      maxTopTokenFrac = 0.5, maxDupBigramFrac = 0.8, numHashes = 16, bands = 8)
    val out = CorpusPipeline.run(docs, "doc_id", "text", "source", cfg)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId.keySet == Set(1L, 4L), s"repetition gates wrong: ${byId.keySet}")
    assert(byId(1L).contains("<EMAIL>") && !byId(1L).contains("alice@"),
      s"PII not masked: ${byId(1L)}")
  }

  test("compression-ratio band is ON by default: kills machine text, spares short docs") {
    import spark.implicits._
    val machine = (1 to 80).map(_ => "buy now click here").mkString(" ")
    // varied prose deflates mid-band (~0.6); alnum junk stays high (~0.78)
    val prose = "columnar parquet storage enables efficient predicate " +
      "pushdown while late materialization keeps wide scans cheap for " +
      "analysts the planner reorders joins using statistics gathered from " +
      "footer metadata and runtime sampling across many partitioned inputs " +
      "adaptive execution splits skewed shuffle blocks so no single task " +
      "drags the stage while broadcast thresholds bound memory use"
    val rnd = new scala.util.Random(7)
    val alnum = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val junk = "x " + (1 to 800).map(_ => alnum(rnd.nextInt(alnum.length)))
      .grouped(100).map(_.mkString).mkString(" ")
    // short prose (<200 bytes) deflates >1.0 from header overhead alone —
    // the length floor must exempt it or the default band silently eats
    // every short document
    val short = "tiny prose survives the band gate"
    val docs = Seq(
      (1L, machine, "web"), // deflates to ~nothing → below default min 0.10
      (2L, prose, "web"),
      (3L, junk, "web"),    // ~0.78: inside the default band, junky but kept
      (4L, short, "web")
    ).toDF("doc_id", "text", "source")
    val base = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      numHashes = 16, bands = 8)
    // DEFAULT config: band active at (0.10, 1.10) with the 200-byte floor
    val dflt = CorpusPipeline.run(docs, "doc_id", "text", "source", base)
    assert(dflt.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L), "default band must drop machine text and spare short docs")
    // tightened band cuts both tails
    val on = CorpusPipeline.run(docs, "doc_id", "text", "source",
      base.copy(minDeflateRatio = 0.15, maxDeflateRatio = 0.72))
    assert(on.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 4L),
      "band must cut both tails")
    // explicit off: everything passes
    val off = CorpusPipeline.run(docs, "doc_id", "text", "source",
      base.copy(minDeflateRatio = 0.0, maxDeflateRatio = 2.0))
    assert(off.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L), "(0,2) must disable the band")
  }

  test("token-budget stage spends each stratum's budget on quality order; off by default") {
    import spark.implicits._
    // two strata, no cross-doc shingles (all tokens doc-specific);
    // every doc is 9 tokens, quality varies via the repeat count r:
    // distinct/total = (9-r)/9, so quality order within a stratum is
    // r=0 > r=1 > r=2 > r=3 (ties impossible)
    val docs = (1 to 8).map { i =>
      val stratum = if (i <= 4) "web" else "books"
      val r = i % 4
      val uniq = (0 until 8 - r).map(j => s"tok${i}_$j")
      val pad = Seq.fill(r + 1)(s"pad$i")
      (i.toLong, (uniq ++ pad).mkString(" "), stratum)
    }.toDF("doc_id", "text", "source")
    val base = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      numHashes = 16, bands = 8)

    // off by default: all 8 survive
    val all = CorpusPipeline.run(docs, "doc_id", "text", "source", base)
    assert(all.count() == 8)

    // a 20-token budget keeps ~2 docs per stratum, highest quality first
    val out = CorpusPipeline.run(docs, "doc_id", "text", "source",
      base.copy(tokenBudgetPerStratum = Some(20L)))
    val perStratum = out.groupBy("stratum")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tok"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("tok"), r.getAs[Long]("n"))).toMap
    assert(perStratum.keySet == Set("web", "books"))
    perStratum.foreach { case (s, (tok, n)) =>
      assert(tok <= 20L, s"stratum $s over budget: $tok")
      assert(n >= 1, s"stratum $s empty")
    }
    // greedy on quality: within each stratum the kept docs are the
    // top-quality prefix of the survivors
    val qs = all.select("stratum", "doc_id", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val keptIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    Seq("web", "books").foreach { s =>
      val ranked = qs.filter(_._1 == s).sortBy(t => (-t._3, t._2)).map(_._2)
      val keptInS = ranked.filter(keptIds.contains)
      assert(ranked.startsWith(keptInS), s"not a quality prefix in $s")
    }
  }

  test("blocklist gate drops dense and phrase-matching docs; off by default") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean prose about distributed query planning and storage formats", "web"),
      (2L, "badword scattered badword heavily badword through badword here badword now", "web"), // dense
      (3L, "one badword inside an otherwise long and perfectly ordinary passage of text about engines and planners and scans", "web"), // sparse: survives density
      (4L, "this text contains the exact forbidden phrase in the middle of it", "web"),
      (5L, "phrases like forbidden phrasing do not match on token boundaries at all", "web"))
      .toDF("doc_id", "text", "source")
    val base = CorpusPipeline.Config(minTokens = 3, minQuality = 0.0,
      minDeflateRatio = 0.0, maxDeflateRatio = 2.0)
    assert(CorpusPipeline.run(docs, "doc_id", "text", "source", base)
      .count() == 5, "gate must be off by default")
    val kept = CorpusPipeline.run(docs, "doc_id", "text", "source",
      base.copy(blockTerms = Seq("badword"),
        blockPhrases = Seq("forbidden phrase"), maxBlockedPerMille = 100L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L), s"kept: $kept")
  }

  test("packing tails cover every kept doc's tokens exactly") {
    val docs = corpus()
    val cfg = CorpusPipeline.Config(minTokens = 5, minQuality = 0.0,
      numHashes = 16, bands = 8)
    val kept = CorpusPipeline.run(docs, "doc_id", "text", "source", cfg)
      .localCheckpoint()
    val tokens = kept.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val L = 16L
    // pack-then-split: per-doc segment lengths sum to its token count
    val seg = CorpusPipeline.packSequences(kept, L).collect()
      .groupBy(_.getAs[Long]("key"))
      .view.mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    assert(seg == tokens, s"segment map must cover every kept doc: $seg")
    // best-fit: same coverage, no bin overflow
    val placed = CorpusPipeline.packBestFit(kept, L)
    assert(placed.collect().groupBy(_.getAs[Long]("key"))
      .view.mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap == tokens)
    placed.groupBy("group", "bin_id")
      .agg(org.apache.spark.sql.functions.sum("n_toks").as("fill"))
      .collect().foreach(r => assert(r.getAs[Long]("fill") <= L))
  }
}
