package graft.queries

import graft.Materialize._

import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ArrayType(FloatType)).
  *  - q70: brute-force cosine top-k — the correctness baseline; the
  *    query side is tiny (broadcast), so the corpus streams through one
  *    codegen'd projection with a per-query top-k (no global sort).
  *  - q71: random-hyperplane LSH buckets — the 100 TB path; candidates
  *    only join within a bucket (equi-join shuffle, not cross product).
  *  - q72: per-label norm statistics (decimal-exact aggregation).
  */
object VectorQueries {

  private val TopK = 5
  private val NQueries = 3
  private val Planes = 8

  // q111 JL projection: target dim + plane-family offset (disjoint
  // from the q71 buckets' [0,8) and q69 bands' ranges)
  private val ProjK = 8
  private val ProjOffset = 512

  // q143 fixed-point quantization scale (2^24: full float32 mantissa)
  private val QScale = 16777216.0

  val queries: Map[String, Q] = Map(
    "q70_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.where(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand_id"))
      c.crossJoin(broadcast(q))
        .withColumn("cos", cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= TopK)
        .select(col("query_id"), col("rn"), col("cand_id"), col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    "q71_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          lshBucket(col("embedding"), Planes).as("bucket"))
      val q = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
      val c = emb.where(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand_id"))
      c.join(broadcast(q), "bucket")
        .withColumn("cos", cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= TopK)
        .select(col("query_id"), col("rn"), col("cand_id"), col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    "q72_vector_stats" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          round(norm2(col("embedding")), 6).cast("decimal(18,6)").as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("nrm")).cast("double").as("sum_norm"))
        .orderBy(col("label")))
,
    // embedding-cosine near-dup PAIRS (the dedup-family member of the
    // vector suite): multi-band random-hyperplane LSH — candidates meet
    // in any of `DedupBands` independent bucket codes (equi-join), exact
    // cosine verifies. The oracle mirrors the banding bit-for-bit, so
    // the candidate sets are identical on both engines.
    "q69_dedup_embedding" -> ((s, dir) => {
      // band codes computed ONCE per vector (array of DedupBands ints),
      // then exploded; a pair meeting in several bands is emitted only at
      // its smallest matching band (cheap carried-key compares) — no
      // distinct() shuffle over the candidate set.
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          array((0 until DedupBands).map(b =>
            lshBucketBand(col("embedding"), DedupPlanes, b * DedupPlanes)): _*).as("ks"))
      val bands = emb.select(col("vec_id"), col("embedding"), col("ks"),
        explode(array((0 until DedupBands).map(b =>
          struct(lit(b).as("b"), element_at(col("ks"), b + 1).as("k"))): _*)).as("band"))
      val a = bands.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("ks").as("ks1"), col("band"))
      val b = bands.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("ks").as("ks2"), col("band"))
      val earlier = (0 until DedupBands).map(j =>
        (col("band.b") > j) &&
          (element_at(col("ks1"), j + 1) === element_at(col("ks2"), j + 1)))
        .reduce(_ || _)
      a.join(b, "band")
        .where(col("v1") < col("v2"))
        .where(!earlier)
        .withColumn("cos", cosine(col("e1"), col("e2")))
        .where(col("cos") >= DedupTau)
        .select(col("v1"), col("v2"), col("cos"))
        .orderBy(col("v1"), col("v2"))
    }),

    // ORACLE TWIN of q89's SemDeDup: the IDENTICAL prune kernel
    // (SemanticDedup.verdictsFromAssignments — greedy-by-id, drop on ANY
    // close lower-id cluster-mate) over DETERMINISTIC random-hyperplane
    // buckets instead of k-means lists. k-means has no DuckDB twin, but
    // the kernel does — so this pins the dedup semantics end-to-end in
    // SQL while q89 exercises the learned-cluster production path. Same
    // one-equi-join-per-cluster 100 TB shape; plane family offset 1024
    // keeps the buckets independent of q71/q69/q111's.
    "q89b_semantic_dedup_exact" -> ((s, dir) => {
      val assignments = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          lshBucketBand(col("embedding"), SemExactPlanes, SemExactOffset)
            .as("list_id"))
      graft.operators.SemanticDedup
        .verdictsFromAssignments(assignments, "vec_id", "embedding",
          threshold = SemDedupTau)
        .orderBy(col("vec_id"))
    }),

    // metadata-FILTERED ANN (the "filtered search" feature vector
    // stores struggle with): each query retrieves only among candidates
    // sharing its label — spelled as a PRE-filter (label equi-join with
    // the broadcast query frame) so the scan never scores disqualified
    // vectors; top-k is exact within the filtered set. At 100 TB the
    // label join composes with label-partitioned storage into partition
    // pruning; a post-filter top-k would under-fill k instead.
    "q164_ann_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val c = emb.where(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
          col("label"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand_id"))
      c.join(broadcast(q), col("label") === col("qlabel"))
        .withColumn("cos", cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= TopK)
        .select(col("query_id"), col("rn"), col("cand_id"), col("label"),
          col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    // MMR diversified re-ranking (Carbonell & Goldstein SIGIR'98): the
    // RAG diversity pass between the ANN shortlist and the context
    // window — greedy rel-minus-max-sim selection over the per-query
    // top-N (operators.Mmr; λ=1/2 ⇒ pure IEEE subtraction of two 8-dp
    // cosines, engine-exact). The oracle spells the identical greedy as
    // a recursive CTE — the same construction that made LTTB (q119b)
    // and BPE (q121b) oracle-checkable.
    "q162_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.where(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      graft.operators.Mmr.rerank(q, c, MmrShortlist, MmrK)
        .orderBy(col("query_id"), col("step"))
    })
  )

  private val MmrShortlist = 16
  private val MmrK = 8

  private val DedupBands = 3
  private val DedupPlanes = 8 // 256 buckets/band: candidate volume ~ n²/256 per band
  private val DedupTau = 0.35
  private val SemDedupTau = 0.35 // same radius as the LSH banded path (q69)
  private val SemExactPlanes = 5 // 32 deterministic buckets for q89b
  private val SemExactOffset = 1024 // plane family disjoint from q69/q71/q111

  /** IVF ANN as a rows-only query (no SQL-expressible oracle — k-means
    * has no DuckDB twin; IvfIndexSpec covers recall/exactness within
    * probed lists). Deterministic: fixed k-means seed. Registered so the
    * driver's correctness gate records it, like q80. */
  // an IVF index is built once and amortized over queries — cache the
  // model per dataset (same lifecycle as q90's one-time engine write)
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model]
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.PqIndex.Model]
  private val ivfPqCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfPq.Model]
  private val semCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.IvfIndex.Model]

  val rowsOnlyQueries: Map[String, Q] = Map(
    // SemDeDup semantic dedup (rows-only like q73: the k-means
    // clustering has no DuckDB twin; SemanticDedupSpec proves the
    // within-cluster contract against a driver-side reference and
    // planted duplicates). Clusters the FULL embeddings table — the ANN
    // index (ivfCache) excludes the query rows, and a dedup that
    // silently skipped them would under-delete — so this builds its own
    // cached quantizer over every vector.
    "q89_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = semCache.getOrElseUpdate(dir,
        graft.operators.IvfIndex.build(emb, "vec_id", "embedding", nLists = 8))
      graft.operators.SemanticDedup
        .verdictsFromAssignments(model.assignments, "vec_id", "embedding",
          threshold = SemDedupTau)
        .orderBy(col("vec_id"))
    }),

    // PQ-ADC ANN (rows-only like q73: k-means codebooks have no DuckDB
    // twin; PqIndexSpec covers recall vs brute force + self-match).
    // The corpus is scanned in compressed-code form only — the 100 TB
    // memory-bound path; composes with IVF for IVF-PQ.
    "q74_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = pqCache.getOrElseUpdate(dir,
        graft.operators.PqIndex.build(
          emb.where(col("vec_id") >= NQueries), "vec_id", "embedding",
          dim = 64, m = 8, ksub = 16))
      graft.operators.PqIndex.search(model, queriesDf, "vec_id", "embedding",
          k = TopK)
        .orderBy(col("query_id"), col("rn"))
    }),

    // IVF-PQ composition (rows-only; IvfPqSpec pins recall + probe
    // bounding): probing bounds WHICH vectors are scanned, codes bound
    // WHAT is read per vector — the two bounds multiply at 100 TB.
    "q79_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = ivfPqCache.getOrElseUpdate(dir,
        graft.operators.IvfPq.build(
          emb.where(col("vec_id") >= NQueries), "vec_id", "embedding",
          dim = 64, nLists = 8, m = 8, ksub = 16))
      graft.operators.IvfPq.search(model, queriesDf, "vec_id", "embedding",
          k = TopK, nProbe = 2)
        .orderBy(col("query_id"), col("rn"))
    }),

    // matrix-free JL random projection (64 -> 8 dims): the cheap
    // front-end to clustering/ANN when raw dimension drives cost.
    // Pure per-row compute — no stored matrix, no broadcast, no
    // shuffle before the sort; weights derive from (plane, dim)
    // integer arithmetic, the same family the LSH buckets use (plane
    // range disjoint via ProjOffset). Exploded to scalar rows for
    // engine-parity hashing (array columns don't sort portably).
    "q111_embedding_project" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(randProject(col("embedding"), ProjK, ProjOffset)))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "p")
        .orderBy(col("vec_id"), col("dim"))),

    "q73_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = ivfCache.getOrElseUpdate(dir,
        graft.operators.IvfIndex.build(
          emb.where(col("vec_id") >= NQueries), "vec_id", "embedding", nLists = 8))
      graft.operators.IvfIndex.search(model, queriesDf, "vec_id", "embedding",
          k = TopK, nProbe = 2)
        .orderBy(col("query_id"), col("rn"))
    }),

    // per-label centroid drift: cosine of each label's mean vector to
    // the corpus mean — the "is this slice embedding-shifted" monitor
    // (a drifting source/label is the canary for distribution shift in
    // training data). EXACT despite float inputs: components quantize
    // to 2^-24 fixed point (floor of an exactly-representable double —
    // both engines agree bit-for-bit), per-dim sums are decimal/
    // hugeint, and cos = dot/√(n2a·n2g) needs only mean RATIOS, so the
    // 1/n factors cancel and no division happens before the final
    // three IEEE ops. Scale: one explode + two (label,dim)-keyed
    // aggregations; the centroid frame is labels×dims rows — the
    // corpus never self-joins. Sums hold to ~1e12 rows/label at this
    // magnitude; beyond that the decimal(38) products degrade loudly
    // (null), not silently.
    "q143_centroid_drift" -> ((s, dir) => {
      val qv = t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").as("dim"),
          floor(col("col").cast("double") * QScale).cast("decimal(38,0)").as("q"))
      val byLabel = qv.groupBy(col("label"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .materialize() // labels×dims rows feed TWO consumers — one
      // corpus scan total, not one per consumer
      val global = byLabel.groupBy(col("dim"))
        .agg(sum(col("s")).as("g"))
      byLabel.join(global, "dim")
        .groupBy(col("label"))
        .agg(max(col("n")).as("n_vecs"),
          sum(col("s") * col("g")).as("dot"),
          sum(col("s") * col("s")).as("n2l"),
          sum(col("g") * col("g")).as("n2g"))
        .select(col("label"), col("n_vecs"),
          when(col("n2l") === 0 || col("n2g") === 0, lit(null).cast("double"))
            .otherwise(col("dot").cast("double") /
              sqrt(col("n2l").cast("double") * col("n2g").cast("double")))
            .as("cos_to_global"))
        .orderBy(col("label"))
    })
  )

  // Exactness twins for the three ANN indexes (oracle-checked, unlike the
  // production-parameter rows-only variants above): IVF probed at EVERY
  // list and PQ/IVF-PQ re-ranked over an un-truncating shortlist are
  // provably exact (AnnRecallSpec hard-asserts full-probe == brute
  // force), so the same brute-force top-k SQL the engine-agnostic oracle
  // can express covers the whole index path — build, probe/ADC join,
  // shortlist window, re-rank — end to end. Production parameters (the
  // approximate regime the oracle can't express) stay pinned by recall
  // curves in AnnRecallSpec.
  private val FullShortlist = 1 << 20

  val exactTwinQueries: Map[String, Q] = Map(
    "q73b_ann_ivf_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = ivfCache.getOrElseUpdate(dir,
        graft.operators.IvfIndex.build(
          emb.where(col("vec_id") >= NQueries), "vec_id", "embedding", nLists = 8))
      graft.operators.IvfIndex.search(model, queriesDf, "vec_id", "embedding",
          k = TopK, nProbe = 8)
        .orderBy(col("query_id"), col("rn"))
    }),

    "q74b_ann_pq_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(col("vec_id") >= NQueries)
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = pqCache.getOrElseUpdate(dir,
        graft.operators.PqIndex.build(corpus, "vec_id", "embedding",
          dim = 64, m = 8, ksub = 16))
      graft.operators.PqIndex.searchRerank(model, corpus, "vec_id", "embedding",
          queriesDf, "vec_id", "embedding", k = TopK, shortlist = FullShortlist)
        .orderBy(col("query_id"), col("rn"))
    }),

    "q79b_ann_ivfpq_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queriesDf = emb.where(col("vec_id") < NQueries)
        .select(col("vec_id"), col("embedding"))
      val model = ivfPqCache.getOrElseUpdate(dir,
        graft.operators.IvfPq.build(
          emb.where(col("vec_id") >= NQueries), "vec_id", "embedding",
          dim = 64, nLists = 8, m = 8, ksub = 16))
      graft.operators.IvfPq.searchRerank(model, queriesDf, "vec_id", "embedding",
          k = TopK, nProbe = 8, shortlist = FullShortlist)
        .orderBy(col("query_id"), col("rn"))
    })
  )

  private lazy val bruteCosSql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |           WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
       |      WHERE vec_id >= $NQueries),
       |scored AS (SELECT query_id, cand_id, ${cosineSql("qv", "cv")} AS cos
       |           FROM c CROSS JOIN q)
       |SELECT query_id, rn, cand_id, cos FROM (
       |  SELECT query_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK ORDER BY query_id, rn""".stripMargin

  private lazy val bruteL2Sql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |           WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
       |      WHERE vec_id >= $NQueries),
       |scored AS (SELECT query_id, cand_id, ${l2Sql("qv", "cv")} AS l2_dist
       |           FROM c CROSS JOIN q)
       |SELECT query_id, cand_id, l2_dist, rn FROM (
       |  SELECT query_id, cand_id, l2_dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2_dist ASC, cand_id) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK ORDER BY query_id, rn""".stripMargin

  val oracles: Map[String, String] = Map(
    "q143_centroid_drift" ->
      s"""WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding) AS v FROM embeddings),
         |qz AS (SELECT label, i - 1 AS dim,
         |    CAST(FLOOR(CAST(v AS DOUBLE) * $QScale) AS HUGEINT) AS q FROM e),
         |bl AS (SELECT label, dim, SUM(q) AS s, COUNT(*) AS n
         |  FROM qz GROUP BY 1, 2),
         |g AS (SELECT dim, SUM(s) AS gs FROM bl GROUP BY 1),
         |a AS (SELECT label, MAX(n) AS n_vecs, SUM(s * gs) AS dot,
         |    SUM(s * s) AS n2l, SUM(gs * gs) AS n2g
         |  FROM bl JOIN g USING (dim) GROUP BY label)
         |SELECT label, n_vecs,
         |  CASE WHEN n2l = 0 OR n2g = 0 THEN NULL
         |    ELSE CAST(dot AS DOUBLE) /
         |      sqrt(CAST(n2l AS DOUBLE) * CAST(n2g AS DOUBLE)) END
         |    AS cos_to_global
         |FROM a ORDER BY label""".stripMargin,

    "q111_embedding_project" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    ${randProjectSql("embedding", ProjK, ProjOffset)} AS pr
         |  FROM embeddings),
         |i AS (SELECT unnest(generate_series(1, $ProjK)) AS i)
         |SELECT vec_id, label, CAST(i - 1 AS INT) AS dim, pr[i] AS p
         |FROM e, i ORDER BY vec_id, dim""".stripMargin,

    "q164_ann_filtered" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |    label AS qlabel FROM embeddings WHERE vec_id < $NQueries),
         |c AS (SELECT vec_id AS cand_id, embedding AS cv, label
         |      FROM embeddings WHERE vec_id >= $NQueries),
         |scored AS (SELECT query_id, cand_id, label,
         |    ${cosineSql("qv", "cv")} AS cos
         |  FROM c JOIN q ON c.label = q.qlabel)
         |SELECT query_id, rn, cand_id, label, cos FROM (
         |  SELECT query_id, cand_id, label, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, cand_id) AS rn
         |  FROM scored)
         |WHERE rn <= $TopK ORDER BY query_id, rn""".stripMargin,

    // the MMR greedy as a recursive CTE: the working table carries the
    // selected-so-far rows each iteration (each keeping its own pick
    // step and stats); every round appends the argmax of
    // rel − max(sim to selected) among the not-yet-picked shortlist,
    // ties to the smaller cand_id — exactly operators.Mmr's fold
    "q162_mmr_rerank" ->
      s"""WITH RECURSIVE
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |      WHERE vec_id < $NQueries),
         |c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
         |      WHERE vec_id >= $NQueries),
         |scored AS (SELECT query_id, cand_id, cv, ${cosineSql("qv", "cv")} AS rel
         |           FROM c CROSS JOIN q),
         |short AS (SELECT query_id, cand_id, cv, rel FROM (
         |    SELECT query_id, cand_id, cv, rel,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, cand_id) AS rn
         |    FROM scored) WHERE rn <= $MmrShortlist),
         |sims AS (SELECT a.query_id, a.cand_id AS i, b.cand_id AS j,
         |    ${cosineSql("a.cv", "b.cv")} AS sim
         |  FROM short a JOIN short b
         |    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
         |sel(it, query_id, step, cand_id, rel, max_sim, score) AS (
         |  SELECT 1, query_id, CAST(1 AS BIGINT), cand_id, rel,
         |    CAST(0.0 AS DOUBLE), rel FROM (
         |    SELECT query_id, cand_id, rel,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY rel DESC, cand_id) AS rn
         |    FROM short) WHERE rn = 1
         |  UNION ALL
         |  (WITH cur AS (SELECT * FROM sel WHERE it < $MmrK),
         |   pen AS (SELECT s.query_id, s.cand_id, s.rel, max(m.sim) AS max_sim
         |       FROM short s
         |       JOIN sims m ON m.query_id = s.query_id AND m.i = s.cand_id
         |       JOIN cur p ON p.query_id = m.query_id AND p.cand_id = m.j
         |       WHERE NOT EXISTS (SELECT 1 FROM cur p2
         |         WHERE p2.query_id = s.query_id AND p2.cand_id = s.cand_id)
         |       GROUP BY s.query_id, s.cand_id, s.rel),
         |   pick AS (SELECT query_id, cand_id, rel, max_sim,
         |       rel - max_sim AS score FROM (
         |       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY rel - max_sim DESC, cand_id) AS rn FROM pen)
         |     WHERE rn = 1)
         |   SELECT it + 1, query_id, step, cand_id, rel, max_sim, score FROM cur
         |   UNION ALL
         |   SELECT (SELECT max(it) FROM cur) + 1, query_id,
         |     CAST((SELECT max(it) FROM cur) + 1 AS BIGINT),
         |     cand_id, rel, max_sim, score FROM pick)
         |)
         |SELECT query_id, step, cand_id, rel, max_sim, score
         |FROM sel WHERE it = $MmrK ORDER BY query_id, step""".stripMargin,

    "q70_ann_bruteforce" -> bruteCosSql,
    // IVF probed at every list == exact brute force (AnnRecallSpec).
    "q73b_ann_ivf_exact" -> bruteCosSql,
    // PQ / IVF-PQ with an un-truncating re-rank shortlist == exact
    // brute-force L2 (re-rank metric).
    "q74b_ann_pq_exact" -> bruteL2Sql,
    "q79b_ann_ivfpq_exact" -> bruteL2Sql,

    // same greedy-by-id prune rule as the Spark kernel: dup_of = min
    // lower-id cluster-mate within the cosine radius, kept iff none
    "q89b_semantic_dedup_exact" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${lshBucketBandSql("embedding", SemExactPlanes, SemExactOffset)} AS list_id
         |  FROM embeddings),
         |d AS (SELECT a.vec_id AS id_a, MIN(b.vec_id) AS dup_of
         |  FROM e a JOIN e b
         |    ON a.list_id = b.list_id AND b.vec_id < a.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= $SemDedupTau
         |  GROUP BY a.vec_id)
         |SELECT e.vec_id, e.list_id AS cluster_id, d.dup_of,
         |  CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS is_kept
         |FROM e LEFT JOIN d ON e.vec_id = d.id_a
         |ORDER BY e.vec_id""".stripMargin,

    "q71_ann_lsh" -> {
      s"""WITH e AS (SELECT vec_id, embedding,
         |  ${lshBucketSql("embedding", Planes)} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e
         |      WHERE vec_id < $NQueries),
         |c AS (SELECT vec_id AS cand_id, embedding AS cv, bucket FROM e
         |      WHERE vec_id >= $NQueries),
         |scored AS (SELECT query_id, cand_id, ${cosineSql("qv", "cv")} AS cos
         |           FROM c JOIN q USING (bucket))
         |SELECT query_id, rn, cand_id, cos FROM (
         |  SELECT query_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rn
         |  FROM scored)
         |WHERE rn <= $TopK ORDER BY query_id, rn""".stripMargin
    },

    "q72_vector_stats" ->
      s"""SELECT label, COUNT(*) AS n,
         |  CAST(SUM(CAST(round(${norm2Sql("embedding")}, 6) AS DECIMAL(18,6))) AS DOUBLE)
         |    AS sum_norm
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q69_dedup_embedding" -> {
      val bandRows = (0 until DedupBands).map(b =>
        s"SELECT vec_id, $b AS band, " +
          s"${lshBucketBandSql("embedding", DedupPlanes, b * DedupPlanes)} AS k FROM e")
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |bands AS ($bandRows),
         |cand AS (SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
         |         FROM bands x JOIN bands y
         |         ON x.band = y.band AND x.k = y.k AND x.vec_id < y.vec_id)
         |SELECT v1, v2, cos FROM (
         |  SELECT v1, v2, ${cosineSql("a.embedding", "b.embedding")} AS cos
         |  FROM cand JOIN e a ON v1 = a.vec_id JOIN e b ON v2 = b.vec_id)
         |WHERE cos >= $DedupTau ORDER BY v1, v2""".stripMargin
    }
  )
}
