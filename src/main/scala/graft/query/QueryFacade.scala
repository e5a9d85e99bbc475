package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** The serving-layer query facade — the Spark analog of the reference's
  * `/api/v1/query` pipeline (SURVEY §3.1). Everything the reference does
  * with regex rewrites (table-ref rewriting, SHOW interception, pruning)
  * is native here; what remains is the serving contract:
  *
  *  - JSON result envelope `{columns, data, row_count, execution_time_ms}`
  *    (internal/api/query.go:660-675), encoded from internal rows by
  *    schema-specialized appenders (RowCodec) with row caps pushed into
  *    the plan;
  *  - row caps (governance max-rows, query.go:1439-1468);
  *  - query registry + cancellation (internal/queryregistry) via Spark
  *    job groups;
  *  - estimate: `SELECT COUNT(*) FROM (q)` wrapper (query.go:3669-3671).
  */
final class QueryFacade(spark: SparkSession) {

  graft.GraftFunctions.registerAll(spark)

  private val seq = new AtomicLong(0)
  // id -> (job group, sql, start ns)
  private val active = TrieMap.empty[Long, (String, String, Long)]

  /** Slow-query WARN threshold in ms; 0 = disabled (the reference's
    * `query.slow_query_threshold_ms`, internal/api/query.go:623,853-868:
    * WARN log with sql + execution time + row count, plus a counter).
    * Completed queries above it land in a bounded recent-slow ring for
    * the ops surface.
    *
    * DEFAULT = 0, deliberately: parity with the reference's shipped
    * default (config.go:1467 `SetDefault(..., 0)`); its example config
    * suggests 1000 ms when enabled (arc.toml:117) — exposed here as
    * [[QueryFacade.RecommendedSlowQueryThresholdMs]]. Decision recorded
    * in SCALE.md (round 5). */
  @volatile var slowQueryThresholdMs: Long = 0L

  private val slowTotal = new AtomicLong(0)
  private val recentSlow =
    new java.util.concurrent.ConcurrentLinkedDeque[QueryFacade.SlowQuery]()

  // completed/failed/cancelled queries, newest last (reference
  // queryregistry/registry.go:55 ring buffer, default size 100)
  private val history =
    new java.util.concurrent.ConcurrentLinkedDeque[QueryFacade.HistoryEntry]()
  private def addHistory(e: QueryFacade.HistoryEntry): Unit = {
    history.addLast(e)
    while (history.size() > QueryFacade.HistoryCap) history.pollFirst()
  }

  /** Most recent finished queries, NEWEST FIRST like the reference's
    * GetHistory (registry.go:211), capped at `limit`. */
  def recentHistory(limit: Int): Seq[QueryFacade.HistoryEntry] = {
    val it = history.descendingIterator()
    val b = Seq.newBuilder[QueryFacade.HistoryEntry]
    var n = 0
    while (it.hasNext && n < limit) { b += it.next(); n += 1 }
    b.result()
  }

  def historyLen: Int = history.size()

  def sql(q: String): DataFrame = spark.sql(q)

  /** SHOW DATABASES / SHOW TABLES [FROM db] intercepted as storage
    * listings against a catalog (the reference diverts these before the
    * executor, query.go:50-58); everything else goes to spark.sql. */
  def sqlWithShow(q: String, catalog: graft.catalog.GraftCatalog): DataFrame =
    sqlWithShow(q, catalog, spark.sql)

  /** Read-only gate for the serving surface: the reference's user-facing
    * query API blocks every state-changing statement (its
    * dangerousSQLPattern regex over comment-stripped, literal-masked
    * text, internal/api/query.go — DDL/DML/SET/ATTACH/COPY/…). The
    * Spark-first equivalent is an AST check, immune to the comment and
    * string-literal evasions the reference's regex has to strip first.
    *
    * The check walks the ENTIRE parsed tree — plan nodes, their
    * expressions, and every subquery plan inside those expressions — not
    * just the root: `WITH c AS (SELECT 1) INSERT INTO …` parses to an
    * UnresolvedWith whose CHILD is the insert, and a scalar subquery can
    * smuggle a blocked construct anywhere an expression fits. Blocked
    * anywhere in the tree:
    *
    *  - any `logical.Command` (CreateTable, DropTable, SetCommand, …)
    *    and the unresolved DML statements (InsertInto…, MergeInto…,
    *    UpdateTable, DeleteFrom…, matched by name because they only
    *    become Commands after analysis);
    *  - direct file-format relations (`SELECT * FROM parquet.`/path``,
    *    text.`/etc/passwd`, …) — arbitrary server-filesystem reads; the
    *    reference blocks this whole class on its query surface
    *    (dangerousSQLPattern's ATTACH/COPY/LOAD family);
    *  - `reflect` / `java_method` — arbitrary public-static-method
    *    invocation (e.g. java.lang.System.getenv) is RCE-class, blocked
    *    like the reference's EXEC/INSTALL patterns.
    *
    * SHOW is intercepted before this check by [[sqlWithShow]].
    * Throws IllegalArgumentException for blocked statements. */
  def requireReadOnly(session: org.apache.spark.sql.SparkSession, q: String): Unit = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Expression, PlanExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}

    def deny(what: String): Nothing =
      throw new IllegalArgumentException(s"read-only query API: $what is not allowed")

    def checkExpr(e: Expression): Unit = e.foreach {
      case f: UnresolvedFunction
          if QueryFacade.BlockedFunctions.contains(
            f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
        deny(s"function ${f.nameParts.mkString(".")}")
      case pe: PlanExpression[_] => pe.plan match {
        case lp: LogicalPlan => checkPlan(lp)
        case _ => ()
      }
      case _ => ()
    }

    def checkPlan(plan: LogicalPlan): Unit = plan.foreach { node =>
      node match {
        case _: Command => deny(s"statement type ${node.getClass.getSimpleName}")
        case r: UnresolvedRelation
            if r.multipartIdentifier.length == 2 &&
              QueryFacade.FileFormatSources.contains(
                r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) =>
          deny(s"direct file-format relation ${r.multipartIdentifier.head}.`…`")
        case n =>
          val nm = n.getClass.getSimpleName
          if (QueryFacade.BlockedNodePrefixes.exists(nm.startsWith))
            deny(s"statement type $nm")
      }
      node.expressions.foreach(checkExpr)
    }

    checkPlan(session.sessionState.sqlParser.parsePlan(q))
  }

  /** Every real table the query references, as multipart identifiers —
    * the RBAC batch-check input (reference:
    * internal/api/query.go:1081-1200 extractTableReferences, which
    * regex-scans comment-stripped, literal-masked SQL for FROM/JOIN and
    * then subtracts CTE names and function calls). The Spark-first
    * equivalent walks the PARSED tree: `UnresolvedRelation`s are exactly
    * the table refs (string literals, comments, and table-valued
    * functions never produce one), and CTE-defined names are excluded
    * with PROPER SCOPE — a name is shadowed only inside the
    * `UnresolvedWith` that defines it (its body, and each CTE definition
    * only by the names preceding it, plus its own under recursion).
    * Global subtraction would let `SELECT * FROM secret UNION ALL (WITH
    * secret AS (SELECT 1) SELECT * FROM secret)` hide the OUTER real
    * `secret` ref behind the inner CTE — an RBAC bypass. Subquery plans
    * inside expressions are walked in their enclosing scope —
    * `WHERE x IN (SELECT … FROM secret)` is a read of `secret`. */
  def tableReferences(session: org.apache.spark.sql.SparkSession,
      q: String): Seq[Seq[String]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

    val refs = scala.collection.mutable.LinkedHashSet.empty[Seq[String]]
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)

    def walk(plan: LogicalPlan, shadow: Set[String]): Unit = {
      plan match {
        case w: UnresolvedWith =>
          // each CTE body sees the names defined BEFORE it (backward
          // refs only), plus its own when recursion is allowed
          var seen = shadow
          w.cteRelations.foreach { rel =>
            val bodyScope =
              if (w.allowRecursion) seen + lower(rel._1) else seen
            walk(rel._2, bodyScope)
            seen += lower(rel._1)
          }
          walk(w.child, seen)
        case r: UnresolvedRelation =>
          val id = r.multipartIdentifier
          if (!(id.length == 1 && shadow.contains(lower(id.head))))
            refs += id
          ()
        case other =>
          other.children.foreach(walk(_, shadow))
      }
      plan.expressions.foreach(_.foreach {
        case pe: PlanExpression[_] => pe.plan match {
          case lp: LogicalPlan => walk(lp, shadow)
          case _ => ()
        }
        case _ => ()
      })
    }

    walk(session.sessionState.sqlParser.parsePlan(q), Set.empty)
    refs.toSeq
  }

  /** [[sqlWithShow]] with a custom runner for the non-SHOW branch (the
    * HTTP layer resolves views in a per-database child session). */
  def sqlWithShow(q: String, catalog: graft.catalog.GraftCatalog,
      run: String => DataFrame): DataFrame = {
    val showDb = "(?i)^\\s*SHOW\\s+DATABASES\\s*;?\\s*$".r
    val showTables = "(?i)^\\s*SHOW\\s+TABLES(?:\\s+FROM\\s+(\\w+))?\\s*;?\\s*$".r
    q match {
      case showDb() => catalog.showDatabases()
      case showTables(db) => catalog.showTables(Option(db).getOrElse("default"))
      case _ => run(q)
    }
  }

  /** Execute under a cancellable job group; returns (queryId, result). */
  def submit(q: String): (Long, DataFrame) = submit(q, spark.sql)

  /** [[submit]] with a custom planner (the HTTP layer routes through
    * [[sqlWithShow]] so SHOW interception shares the registry too).
    * Planning failure (AnalysisException on bad SQL) unwinds the
    * registration — otherwise every typo'd query would leak a phantom
    * registry entry AND leave the pooled thread's job group set, so a
    * later cancel aimed at the dead id would kill whatever unrelated
    * query that thread runs next. */
  def submit(q: String, run: String => DataFrame): (Long, DataFrame) = {
    val id = seq.incrementAndGet()
    val group = s"graft-query-$id"
    active.put(id, (group, q, System.nanoTime()))
    spark.sparkContext.setJobGroup(group, q, interruptOnCancel = true)
    // per-query FAIR pool from a FIXED hashed set: under
    // spark.scheduler.mode=FAIR, pools materialize on demand with
    // weight 1 each, so concurrent queries round-robin task slots
    // instead of FIFO-queueing behind the first long scan (the
    // reference serves 12 concurrent workers — a full scan must not
    // starve a COUNT(*)). The set is fixed at 16 because Spark never
    // removes a pool from the scheduler: a pool per query id would leak
    // one registry entry per query for the life of the context. In FIFO
    // mode the property is inert, so library users who keep the default
    // lose nothing.
    spark.sparkContext.setLocalProperty("spark.scheduler.pool",
      s"graft-pool-${id % QueryFacade.SchedulerPools}")
    try (id, run(q))
    catch {
      case e: Throwable =>
        active.remove(id).foreach { case (_, sql, t0) =>
          addHistory(QueryFacade.HistoryEntry(id, sql, "failed",
            System.currentTimeMillis(), (System.nanoTime() - t0) / 1e6,
            rows = -1L, error = Option(e.getMessage).getOrElse(e.toString)))
        }
        spark.sparkContext.clearJobGroup()
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        throw e
    }
  }

  def cancel(id: Long): Boolean =
    active.remove(id) match {
      case Some((group, sql, t0)) =>
        spark.sparkContext.cancelJobGroup(group)
        addHistory(QueryFacade.HistoryEntry(id, sql, "cancelled",
          System.currentTimeMillis(), (System.nanoTime() - t0) / 1e6,
          rows = -1L, error = ""))
        true
      case None => false
    }

  /** Mark a submitted query finished; `rows` (when the caller knows it)
    * lands in the slow-query record like the reference's handler logs. */
  def complete(id: Long, rows: Long = -1L): Unit = {
    active.remove(id).foreach { case (_, sql, t0) =>
      val ms = (System.nanoTime() - t0) / 1e6
      addHistory(QueryFacade.HistoryEntry(id, sql, "completed",
        System.currentTimeMillis(), ms, rows, error = ""))
      val thr = slowQueryThresholdMs
      if (thr > 0 && ms >= thr) {
        slowTotal.incrementAndGet()
        recentSlow.addLast(QueryFacade.SlowQuery(sql, ms, rows,
          System.currentTimeMillis()))
        while (recentSlow.size() > QueryFacade.SlowRingCap) recentSlow.pollFirst()
        org.slf4j.LoggerFactory.getLogger(classOf[QueryFacade])
          .warn(f"slow query (${ms}%.1f ms >= $thr ms, rows=$rows): $sql")
      }
    }
    spark.sparkContext.clearJobGroup()
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    // NOTE on checkpoint-block lifetime in a long-lived serving session:
    // operators (JaccardDedup, ContainmentDedup, GroupQuantile, …)
    // barrier intermediates via Materialize (localCheckpoint on local
    // masters, reliable checkpoint files otherwise), and those outlive
    // the query. They are reclaimed by Spark's ContextCleaner once the
    // driver-side RDD objects are GC'd (checkpoint files too, with
    // spark.cleaner.referenceTracking.cleanCheckpoints=true) — an
    // EXPLICIT ModelCheckpoint.sweep here is deliberately NOT done: the
    // sweep is session-global, and a swept localCheckpoint cannot be
    // recomputed (lineage truncated), so it would race ANY concurrent
    // checkpoint user outside this facade's registry (compaction jobs,
    // pipelines, a second facade). The sequential harnesses
    // (Bench/Verify) sweep between queries, where quiescence is
    // structural.
  }

  /** Total queries that crossed the slow threshold (the counter metric). */
  def slowQueryCount: Long = slowTotal.get()

  /** Most recent slow queries, oldest first (bounded ring). */
  def slowQueries: Seq[QueryFacade.SlowQuery] = {
    val it = recentSlow.iterator()
    val b = Seq.newBuilder[QueryFacade.SlowQuery]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def activeQueries: Map[Long, String] =
    active.map { case (id, (group, _, _)) => id -> group }.toMap

  /** Row-count estimate with the reference's warning ladder
    * (query.go:3725-3740: none/low/medium/high at 1e4/1e5/1e6) — ONE
    * ladder, shared by the HTTP estimate endpoint so the two can't
    * drift. Returns (rows, warning_level, warning_message). */
  def estimate(q: String): (Long, String, String) = estimate(q, spark.sql)

  /** [[estimate]] with a custom runner (per-database sessions). */
  def estimate(q: String, run: String => DataFrame): (Long, String, String) = {
    val n = run(s"SELECT COUNT(*) AS n FROM ($q)").head().getLong(0)
    if (n > 1000000L)
      (n, "high", s"Large query ($n rows): may take minutes and significant memory.")
    else if (n > 100000L)
      (n, "medium", s"Medium query ($n rows): may take 30-60 seconds.")
    else if (n > 10000L)
      (n, "low", s"$n rows: should complete quickly.")
    else (n, "none", s"Small query ($n rows).")
  }

  /** Stream a result as the reference's JSON envelope. Rows stream in
    * INTERNAL format (per-partition, the driver holds one partition at a
    * time) and are encoded by schema-specialized appenders — no external
    * Row conversion, no per-value boxing (see [[RowCodec]]). */
  def toJsonEnvelope(df: DataFrame, maxRows: Long = Long.MaxValue): String = {
    val t0 = System.nanoTime()
    val columns = df.columns
    val apps = RowCodec.jsonAppenders(df.schema)
    val sb = new StringBuilder(1 << 16)
    sb.append("{\"columns\":[")
    sb.append(columns.map(c => jsonStr(c)).mkString(","))
    sb.append("],\"data\":[")
    val it = RowCodec.internalRows(RowCodec.capped(df, maxRows))
    var n = 0L
    while (it.hasNext && n < maxRows) {
      val row = it.next()
      if (n > 0) sb.append(',')
      sb.append('[')
      var i = 0
      while (i < apps.length) {
        if (i > 0) sb.append(',')
        if (row.isNullAt(i)) sb.append("null") else apps(i)(row, i, sb)
        i += 1
      }
      sb.append(']')
      n += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    sb.append(s"""],"row_count":$n,"execution_time_ms":${math.round(ms * 1000) / 1000.0}}""")
    sb.toString
  }

  /** Distributed variant: rows are JSON-encoded on the executors
    * (mapPartitions), the driver only concatenates partition chunks —
    * the encode cost parallelizes across cores/executors instead of
    * serializing through one driver thread. Preferred for large results;
    * `toJsonEnvelope` remains the constant-memory streaming fallback. */
  def toJsonEnvelopeDistributed(df: DataFrame, maxRows: Long,
      preserveOrder: Boolean = true): String =
    new String(toJsonEnvelopeBytesDistributed(df, maxRows, preserveOrder),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Distributed JSON envelope as UTF-8 wire bytes: executors encode row
    * chunks in parallel, the driver only splices byte runs (one memcpy
    * each — no 50 MB String concat). HTTP layers write these bytes
    * straight to the socket; [[toJsonEnvelopeDistributed]] re-decodes
    * for callers that need text. */
  def toJsonEnvelopeBytesDistributed(df: DataFrame, maxRows: Long,
      preserveOrder: Boolean = true): Array[Byte] = {
    import java.nio.charset.StandardCharsets.UTF_8
    // this variant collects every encoded chunk on the driver before
    // splicing — safe ONLY under a finite cap. The serving routes use
    // the wave-streaming writeJsonEnvelope; callers here (bench, tests,
    // embedded use) must state their bound explicitly.
    require(maxRows > 0 && maxRows < Long.MaxValue,
      "toJsonEnvelopeBytesDistributed requires a finite row cap; " +
        "use writeJsonEnvelope for unbounded streaming")
    val t0 = System.nanoTime()
    val columns = df.columns
    val nCols = columns.length
    val limited = df.limit(maxRows.min(Int.MaxValue).toInt)
    // a LIMIT/ORDER BY result is a single partition; when the caller
    // doesn't need row order on the wire, spread the encode across cores.
    // Only pay the shuffle when the plan is actually narrow — an
    // unconditional repartition re-shuffles results that already span
    // the cluster.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val capped =
      if (preserveOrder ||
        limited.queryExecution.toRdd.getNumPartitions >= math.max(2, parallelism / 2))
        limited
      else limited.repartition(parallelism)
    val chunks = QueryFacade.jsonChunkRdd(capped).collect()
    val rowCount = chunks.map(_._1).sum
    val head = ("{\"columns\":[" + columns.map(QueryFacade.jsonStr).mkString(",") +
      "],\"data\":[").getBytes(UTF_8)
    val ms = (System.nanoTime() - t0) / 1e6
    val tail =
      s"""],"row_count":$rowCount,"execution_time_ms":${math.round(ms * 1000) / 1000.0}}"""
        .getBytes(UTF_8)
    val runs = chunks.map(_._2).filter(_.length > 0)
    val total = head.length.toLong + tail.length +
      runs.map(_.length.toLong).sum + math.max(0, runs.length - 1)
    require(total <= Int.MaxValue, s"JSON envelope too large: $total bytes")
    val out = new Array[Byte](total.toInt)
    var at = 0
    def put(b: Array[Byte]): Unit = {
      System.arraycopy(b, 0, out, at, b.length); at += b.length
    }
    put(head)
    var ri = 0
    while (ri < runs.length) {
      if (ri > 0) { out(at) = ','; at += 1 }
      put(runs(ri))
      ri += 1
    }
    put(tail)
    out
  }

  /** Stream the JSON envelope to `out` without ever materializing the
    * result on the driver: partitions encode their rows on the
    * executors, and the driver fetches the encoded chunks in waves of
    * `wave` partitions — one parallel job per wave, at most `wave`
    * chunks resident at a time. Driver memory is O(wave × chunk size),
    * independent of the result's total size, which is what lets an
    * uncapped 100M-row SELECT flow through a socket the way the
    * reference streams it (internal/api/query.go:1745, fasthttp
    * SetBodyStreamWriter). The default wave (defaultParallelism) keeps
    * every core busy; smaller waves trade throughput for a tighter
    * memory bound. Returns the row count written. */
  def writeJsonEnvelope(df: DataFrame, out: java.io.OutputStream,
      maxRows: Long = Long.MaxValue, wave: Int = 0,
      headExtra: String = ""): Long = {
    import java.nio.charset.StandardCharsets.UTF_8
    val t0 = System.nanoTime()
    val sc = spark.sparkContext
    val w = if (wave > 0) wave else math.max(1, sc.defaultParallelism)
    val columns = df.columns
    val limited =
      if (maxRows < Long.MaxValue) df.limit(maxRows.min(Int.MaxValue).toInt) else df
    val chunkRdd = QueryFacade.jsonChunkRdd(limited)
    // headExtra: pre-encoded `"k":v,` pairs the HTTP layer prepends
    // (success/timestamp in the reference envelope, query.go:660-675)
    out.write(("{" + headExtra + "\"columns\":[" +
      columns.map(QueryFacade.jsonStr).mkString(",") +
      "],\"data\":[").getBytes(UTF_8))
    var rows = 0L
    var wroteAny = false
    val nParts = chunkRdd.getNumPartitions
    var start = 0
    while (start < nParts) {
      val parts = (start until math.min(start + w, nParts)).toArray
      val res = sc.runJob(chunkRdd,
        (it: Iterator[(Long, Array[Byte])]) => it.next(), parts.toSeq)
      res.foreach { case (n, bytes) =>
        if (bytes.length > 0) {
          if (wroteAny) out.write(',')
          out.write(bytes)
          wroteAny = true
          rows += n
        }
      }
      start += w
    }
    val ms = (System.nanoTime() - t0) / 1e6
    out.write(
      s"""],"row_count":$rows,"execution_time_ms":${math.round(ms * 1000) / 1000.0}}"""
        .getBytes(UTF_8))
    rows
  }

  private def jsonStr(s: String): String = QueryFacade.jsonStr(s)

  private def jsonValue(v: Any): String = QueryFacade.jsonValue(v)
}

/** Serializable JSON scalar encoding (shared by driver + executors). */
object QueryFacade {

  /** Size of the fixed FAIR-pool set queries hash into. 16 > the
    * reference's 12-worker concurrency target, so simultaneous queries
    * almost always land in distinct pools, while the scheduler registry
    * stays bounded (Spark never deletes a pool). */
  val SchedulerPools: Int = 16

  /** One slow-query record: the reference logs sql, execution time and
    * row count (rows = -1 when the caller never counted them). */
  final case class SlowQuery(sql: String, ms: Double, rows: Long, atMillis: Long)

  /** One finished query in the history ring (reference TrackedQuery,
    * queryregistry/registry.go:24 — the post-completion fields). */
  final case class HistoryEntry(id: Long, sql: String, status: String,
    endMillis: Long, durationMs: Double, rows: Long, error: String)

  /** History ring capacity (reference RegistryConfig default 100). */
  val HistoryCap = 100

  /** Unresolved-statement name prefixes that are DML before analysis
    * turns them into Commands (InsertIntoStatement, InsertIntoDir,
    * MergeIntoTable, UpdateTable, DeleteFromTable). */
  private[query] val BlockedNodePrefixes: Seq[String] =
    Seq("InsertInto", "MergeInto", "UpdateTable", "DeleteFrom")

  /** File-format datasource shortnames: a 2-part relation with one of
    * these as its qualifier is a direct filesystem read (`parquet.`…``),
    * bypassing the catalog entirely. */
  private[query] val FileFormatSources: Set[String] =
    Set("parquet", "csv", "json", "text", "orc", "avro", "binaryfile",
      "libsvm", "jdbc", "xml", "textfile")

  /** Expression functions blocked on the read-only surface: reflective
    * invocation of arbitrary public static methods. (private[graft]: the
    * admin delete WHERE validator shares the same denylist.) */
  private[graft] val BlockedFunctions: Set[String] = Set("reflect", "java_method")

  /** Bounded recent-slow ring size. */
  private[query] val SlowRingCap = 128

  /** The production threshold the reference's example config recommends
    * when enabling slow-query logging (arc.toml:117: `1000`). */
  val RecommendedSlowQueryThresholdMs = 1000L

  /** Per-partition UTF-8 JSON row runs: each element is one partition's
    * `[v,…],[v,…]` bytes (comma-joined rows, no outer brackets) plus its
    * row count. Runs splice with commas between non-empty ones. */
  private[query] def jsonChunkRdd(capped: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[(Long, Array[Byte])] = {
    val schema = capped.schema
    val nCols = schema.length
    capped.queryExecution.toRdd.mapPartitions { it =>
      val apps = RowCodec.jsonAppenders(schema)
      val sb = new StringBuilder(1 << 16)
      var first = true
      var n = 0L
      while (it.hasNext) {
        val row = it.next()
        if (!first) sb.append(',')
        first = false
        sb.append('[')
        var i = 0
        while (i < nCols) {
          if (i > 0) sb.append(',')
          if (row.isNullAt(i)) sb.append("null") else apps(i)(row, i, sb)
          i += 1
        }
        sb.append(']')
        n += 1
      }
      Iterator((n, sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private[query] def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jsonStr(s)
    case b: Boolean => b.toString
    case t: java.sql.Timestamp => jsonStr(t.toInstant.toString)
    case d: java.sql.Date => jsonStr(d.toString)
    case bd: java.math.BigDecimal => bd.toPlainString
    case n: Number =>
      val d = n.doubleValue()
      if (d.isNaN || d.isInfinite) "null" else n.toString
    case seq: scala.collection.Seq[_] =>
      seq.map(jsonValue).mkString("[", ",", "]")
    case other => jsonStr(String.valueOf(other))
  }
}
