package graft.server

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.HttpExchange
import graft.catalog.GraftCatalog
import graft.ingest.MqttSubscriber
import graft.jobs.{Compaction, ContinuousQuery, Retention, TargetedDelete, Tiering}
import graft.query.QueryFacade
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, lit}

import java.time.Instant
import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import scala.util.matching.Regex

/** The lifecycle/admin HTTP plane — the reference's maintenance surface,
  * bound over the existing library jobs (the round-7 verdict's #1 gap):
  *
  *  - `POST /api/v1/delete` + `GET /api/v1/delete/config` — targeted DML
  *    with dry-run, confirmation, and row caps
  *    (internal/api/delete.go:97-128, :177-186) over
  *    [[graft.jobs.TargetedDelete]];
  *  - `/api/v1/retention` CRUD + `POST /:id/execute` +
  *    `GET /:id/executions` (internal/api/retention.go:220-237) over
  *    [[graft.jobs.Retention]];
  *  - `/api/v1/continuous_queries` CRUD + execute + executions
  *    (internal/api/continuous_query.go:273-283) over
  *    [[graft.jobs.ContinuousQuery]];
  *  - `/api/v1/compaction/{status,stats,candidates,jobs,history,trigger}`
  *    (internal/api/compaction.go:37-51) over [[graft.jobs.Compaction]];
  *  - `/api/v1/tiering/{status,files,migrate,stats,scan}` +
  *    `/api/v1/tiering/policies` CRUD (internal/api/tiering.go:203-213,
  *    tiering_policies.go:195-205) over [[graft.jobs.Tiering]];
  *  - `/api/v1/mqtt/{health,stats}` + `/api/v1/mqtt/subscriptions` CRUD
  *    and lifecycle (internal/api/mqtt.go:29-38,
  *    mqtt_subscriptions.go:35-61) over [[graft.ingest.MqttSubscriber]].
  *
  * Policy records persist as one JSON file each under
  * `{root}/_admin/{kind}/` written tmp+rename (the same visible-only-
  * when-complete contract as CqState) — the Spark-first stand-in for the
  * reference's SQLite metadata store; it works unchanged on any Hadoop
  * FileSystem. Execution HISTORY is a bounded in-memory ring (the last
  * execution's outcome IS persisted on the policy record itself) —
  * durable audit history is ops-plane (SURVEY §2.J11).
  *
  * Scale stance: every handler is metadata-sized on the driver — policy
  * files, partition listings, parquet footers — and delegates data-sized
  * work (delete rewrites, CQ windows, compaction merges) to the
  * distributed jobs, which parallelize per-file / per-partition.
  */
final class AdminApi(srv: HttpServer) {

  private def catalog: GraftCatalog = srv.catalog
  private def hconf = srv.spark.sparkContext.hadoopConfiguration
  private def mapper = srv.mapper
  private def q(s: String) = srv.q(s)
  private def nowIso(): String = Instant.now().toString

  // ---- delete config (reference defaults, config.go:1438-1440) ---------
  /** Reference default is DISABLED for safety (`delete.enabled=false`). */
  @volatile var deleteEnabled: Boolean = false
  @volatile var deleteConfirmationThreshold: Long = 10000L
  @volatile var deleteMaxRows: Long = 1000000L

  // ---- tiering config ---------------------------------------------------
  /** Cold-tier root; settable by embedders (ServeMain flag). Lives under
    * an underscore dir so the catalog never lists it as a database. */
  @volatile var coldRoot: String = s"${catalog.root}/_cold"
  @volatile var defaultColdAfterDays: Int = 30

  // ---- persisted policy stores -----------------------------------------

  /** One-JSON-file-per-record store under `{root}/_admin/{kind}/`.
    * Writes are tmp+rename; id allocation is max+1 under a process lock
    * (the reference is a single process too — its SQLite AUTOINCREMENT
    * plays the same role). */
  private final class Store(kind: String) {
    private val lock = new Object
    private val dir = new Path(catalog.root, s"_admin/$kind")
    private def fs = dir.getFileSystem(hconf)

    def keys(): Seq[String] = {
      val f = fs
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted.toSeq
    }

    def ids(): Seq[Long] = keys().flatMap(_.toLongOption).sorted

    def get(key: String): Option[ObjectNode] =
      RecordFiles.read(hconf, new Path(dir, s"$key.json"))
        .map(bytes => mapper.readTree(bytes).asInstanceOf[ObjectNode])

    def put(key: String, node: ObjectNode): Unit = lock.synchronized {
      RecordFiles.write(hconf, dir, s"$key.json", mapper.writeValueAsBytes(node))
    }

    def create(node: ObjectNode): Long = lock.synchronized {
      val id = ids().lastOption.getOrElse(0L) + 1
      node.put("id", id)
      put(id.toString, node)
      id
    }

    def remove(key: String): Boolean = lock.synchronized {
      val p = new Path(dir, s"$key.json")
      val f = fs
      f.exists(p) && f.delete(p, false)
    }
  }

  private val retentionStore = new Store("retention")

  // retention executions are single-flight (the reference's scheduler
  // runs them serially): concurrent trigger-all calls raced each other's
  // deletes — one tick's footer census read files another tick had just
  // deleted (FileNotFound 500s under the lifecycle soak), and concurrent
  // last-execution writes to the same policy record raced readers into
  // checksum errors. Contended calls get 409, like compaction's trigger.
  private val retentionBusy = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val cqStore = new Store("cq")
  private val tierPolicyStore = new Store("tiering_policies")
  private val mqttStore = new Store("mqtt")

  /** Bounded per-policy execution rings (rendered JSON, newest last). */
  private val execRings = TrieMap.empty[String, ConcurrentLinkedDeque[String]]
  private val ExecRingCap = 256
  private def recordExec(key: String, json: String): Unit = {
    val ring = execRings.getOrElseUpdate(key, new ConcurrentLinkedDeque[String]())
    ring.addLast(json)
    while (ring.size() > ExecRingCap) ring.pollFirst()
  }
  private def execList(key: String): String =
    execRings.get(key) match {
      case None => "[]"
      case Some(ring) => historyJson(ring)
    }

  // ---- compaction bookkeeping -------------------------------------------
  private val compActive = TrieMap.empty[Long, String]
  private val compSeq = new AtomicLong(0)
  private val compCompleted = new AtomicLong(0)
  private val compFailed = new AtomicLong(0)
  private val compHistory = new ConcurrentLinkedDeque[String]()

  // ---- MQTT runtime -------------------------------------------------------
  private val mqttRuntime = TrieMap.empty[Long, MqttSubscriber]
  private val mqttStatus = TrieMap.empty[Long, String] // running/stopped/paused/error

  // ---- JSON helpers -------------------------------------------------------

  private def oText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private def oInt(n: JsonNode, f: String, d: Int): Int =
    Option(n.get(f)).filterNot(_.isNull).map(_.asInt).getOrElse(d)
  private def oBool(n: JsonNode, f: String, d: Boolean = false): Boolean =
    Option(n.get(f)).filterNot(_.isNull).map(_.asBoolean).getOrElse(d)
  private def oArr(n: JsonNode, f: String): Seq[String] =
    Option(n.get(f)).filterNot(_.isNull).toSeq
      .flatMap(a => (0 until a.size()).map(a.get(_).asText))

  private def body(ex: HttpExchange): JsonNode = {
    val raw = srv.readBody(ex)
    if (raw.isEmpty) mapper.createObjectNode() else mapper.readTree(raw)
  }

  private def ok(ex: HttpExchange, status: Int, json: String): Unit =
    srv.sendJson(ex, status, json)
  private def fail(ex: HttpExchange, status: Int, m: String): Unit =
    srv.sendJson(ex, status, s"""{"success":false,"error":${q(m)}}""")
  private def render(node: JsonNode): String = mapper.writeValueAsString(node)

  // ---- routing ------------------------------------------------------------

  private val BackupId: Regex = "/api/v1/backup/([A-Za-z0-9_-]+)".r
  private val RetId: Regex = "/api/v1/retention/([0-9]+)".r
  private val RetExec: Regex = "/api/v1/retention/([0-9]+)/execute".r
  private val RetExecs: Regex = "/api/v1/retention/([0-9]+)/executions".r
  private val CqId: Regex = "/api/v1/continuous_queries/([0-9]+)".r
  private val CqExec: Regex = "/api/v1/continuous_queries/([0-9]+)/execute".r
  private val CqExecs: Regex = "/api/v1/continuous_queries/([0-9]+)/executions".r
  private val TierPol: Regex = "/api/v1/tiering/policies/([A-Za-z0-9_-]+)".r
  private val TierPolEff: Regex = "/api/v1/tiering/policies/([A-Za-z0-9_-]+)/effective".r
  private val SubId: Regex = "/api/v1/mqtt/subscriptions/([0-9]+)".r
  private val SubAct: Regex = "/api/v1/mqtt/subscriptions/([0-9]+)/(start|stop|pause|restart|stats)".r

  /** Dispatch an admin route; false = not an admin path (caller 404s).
    * Handlers may throw — the server's route() wrapper maps exceptions
    * to 400/500 like every other endpoint. */
  private[server] def route(method: String, path: String, ex: HttpExchange): Boolean = {
    (method, path) match {
      case ("POST", "/api/v1/delete") => handleDelete(ex)
      case ("GET", "/api/v1/delete/config") => handleDeleteConfig(ex)

      case ("GET", "/api/v1/retention") => handleRetentionList(ex)
      case ("POST", "/api/v1/retention") => handleRetentionCreate(ex)
      case ("GET", RetExecs(id)) => ok(ex, 200, execList(s"retention/$id"))
      case ("POST", RetExec(id)) => handleRetentionExecute(ex, id.toLong)
      case ("GET", RetId(id)) => handleGet(ex, retentionStore, id, "retention policy")
      case ("PUT", RetId(id)) => handleRetentionUpdate(ex, id.toLong)
      case ("DELETE", RetId(id)) => handleRemove(ex, retentionStore, id, "retention policy")

      case ("GET", "/api/v1/continuous_queries") => handleCqList(ex)
      case ("POST", "/api/v1/continuous_queries") => handleCqCreate(ex)
      case ("GET", CqExecs(id)) => ok(ex, 200, execList(s"cq/$id"))
      case ("POST", CqExec(id)) => handleCqExecute(ex, id.toLong)
      case ("GET", CqId(id)) => handleGet(ex, cqStore, id, "continuous query")
      case ("PUT", CqId(id)) => handleCqUpdate(ex, id.toLong)
      case ("DELETE", CqId(id)) => handleRemove(ex, cqStore, id, "continuous query")

      case ("GET", "/api/v1/compaction/status") => handleCompactionStatus(ex)
      case ("GET", "/api/v1/compaction/stats") => handleCompactionStatus(ex)
      case ("GET", "/api/v1/compaction/candidates") => handleCompactionCandidates(ex)
      case ("GET", "/api/v1/compaction/jobs") => handleCompactionJobs(ex)
      case ("GET", "/api/v1/compaction/history") =>
        ok(ex, 200, historyJson(compHistory))
      case ("POST", "/api/v1/compaction/trigger") => handleCompactionTrigger(ex)

      case ("GET", "/api/v1/tiering/status") | ("GET", "/api/v1/tiering/stats") =>
        handleTieringStatus(ex)
      case ("GET", "/api/v1/tiering/files") => handleTieringFiles(ex)
      case ("POST", "/api/v1/tiering/migrate") => handleTieringMigrate(ex)
      case ("POST", "/api/v1/tiering/scan") => handleTieringScan(ex)
      case ("GET", "/api/v1/tiering/policies") => handleTierPolicyList(ex)
      case ("GET", TierPolEff(db)) => handleTierPolicyEffective(ex, db)
      case ("GET", TierPol(db)) => handleGet(ex, tierPolicyStore, db, "tiering policy")
      case ("PUT", TierPol(db)) => handleTierPolicySet(ex, db)
      case ("DELETE", TierPol(db)) => handleRemove(ex, tierPolicyStore, db, "tiering policy")

      case ("POST", "/api/v1/backup") => handleBackupCreate(ex)
      case ("GET", "/api/v1/backup") => handleBackupList(ex)
      case ("GET", "/api/v1/backup/status") => handleBackupStatus(ex)
      case ("POST", "/api/v1/backup/restore") => handleBackupRestore(ex)
      case ("GET", BackupId(id)) => handleBackupGet(ex, id)
      case ("DELETE", BackupId(id)) => handleBackupDelete(ex, id)

      case ("GET", "/api/v1/schedulers") => handleSchedulers(ex)
      case ("POST", "/api/v1/schedulers/cq/reload") => handleCqReload(ex)
      case ("POST", "/api/v1/schedulers/retention/trigger") =>
        handleRetentionTriggerAll(ex)

      case ("GET", "/api/v1/mqtt/health") => handleMqttHealth(ex)
      case ("GET", "/api/v1/mqtt/stats") => handleMqttStats(ex)
      case ("GET", "/api/v1/mqtt/subscriptions") => handleSubList(ex)
      case ("POST", "/api/v1/mqtt/subscriptions") => handleSubCreate(ex)
      case ("GET", SubAct(id, "stats")) => handleSubStats(ex, id.toLong)
      case ("POST", SubAct(id, act)) => handleSubLifecycle(ex, id.toLong, act)
      case ("GET", SubId(id)) => handleSubGet(ex, id.toLong)
      case ("PUT", SubId(id)) => handleSubUpdate(ex, id.toLong)
      case ("DELETE", SubId(id)) => handleSubDelete(ex, id.toLong)

      case _ => return false
    }
    true
  }

  private def handleGet(ex: HttpExchange, store: Store, key: String,
      what: String): Unit =
    store.get(key) match {
      case Some(n) => ok(ex, 200, render(n))
      case None => fail(ex, 404, s"$what not found: $key")
    }

  private def handleRemove(ex: HttpExchange, store: Store, key: String,
      what: String): Unit =
    if (store.remove(key))
      ok(ex, 200, s"""{"success":true,"deleted":${q(key)}}""")
    else fail(ex, 404, s"$what not found: $key")

  private def historyJson(ring: ConcurrentLinkedDeque[String]): String = {
    val it = ring.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result().mkString("[", ",", "]")
  }

  // ---- targeted delete ----------------------------------------------------

  /** WHERE validation, Spark-first: parse as ONE Catalyst expression
    * (a second statement cannot even parse — the reference needs regex
    * denylists for `;`/comments/keywords, delete.go:137-155, because it
    * interpolates into SQL text) and reject subqueries and reflective
    * functions. Returns (predicate, isFullTableDelete). */
  private def parseWhere(where: String): Either[String, (Column, Boolean)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    if (where.trim.isEmpty) return Right((lit(true), true))
    try {
      val parsed = srv.spark.sessionState.sqlParser.parseExpression(where)
      var bad: Option[String] = None
      parsed.foreach {
        case _: PlanExpression[_] =>
          bad = Some("subqueries are not allowed in a delete WHERE clause")
        case f: UnresolvedFunction
            if QueryFacade.BlockedFunctions.contains(
              f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
          bad = Some(s"function ${f.nameParts.mkString(".")} is not allowed")
        case _ => ()
      }
      bad match {
        case Some(b) => Left(b)
        // no column references (1=1, true, 2>1, …) = full-table delete,
        // the reference's isFullTableDelete confirmation path
        case None =>
          Right((expr(where), !parsed.exists(_.isInstanceOf[UnresolvedAttribute])))
      }
    } catch {
      case e: Exception => Left("invalid WHERE clause: " + srv.msg(e))
    }
  }

  /** POST /api/v1/delete — the reference's DeleteRequest/DeleteResponse
    * contract (delete.go:97-128) over TargetedDelete's census+rewrite. */
  private def handleDelete(ex: HttpExchange): Unit = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1e6
    if (!deleteEnabled) {
      fail(ex, 403,
        "Delete operations are disabled. Enable them in the server config.")
      return
    }
    val b = body(ex)
    val db = oText(b, "database").getOrElse("")
    val meas = oText(b, "measurement").getOrElse("")
    val where = oText(b, "where").getOrElse("")
    val dryRun = oBool(b, "dry_run")
    val confirm = oBool(b, "confirm")
    if (db.isEmpty) { fail(ex, 400, "database is required"); return }
    if (meas.isEmpty) { fail(ex, 400, "measurement is required"); return }
    if (!catalog.isValidDatabaseName(db)) {
      fail(ex, 400, "database name contains invalid characters"); return
    }
    if (srv.MeasName.findFirstIn(meas).isEmpty) {
      fail(ex, 400, "measurement name contains invalid characters"); return
    }
    if (!catalog.listDatabases().contains(db)) {
      fail(ex, 404, s"database not found: $db"); return
    }
    if (!catalog.listTables(db).contains(meas)) {
      fail(ex, 404, s"measurement not found: $db/$meas"); return
    }
    val (predicate, fullTable) = parseWhere(where) match {
      case Left(e) => fail(ex, 400, e); return
      case Right(v) => v
    }
    if (fullTable && !confirm) {
      fail(ex, 400,
        "Full table delete detected. Set confirm=true to proceed."); return
    }
    if (!dryRun && !confirm) {
      fail(ex, 400, "Confirmation required for delete operation. " +
        "Set confirm=true or use dry_run=true to preview."); return
    }
    val pre =
      try TargetedDelete.preview(catalog, db, meas, predicate)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          // unknown column / type mismatch in the (parse-valid) WHERE —
          // a client error, not a server fault
          fail(ex, 400, "invalid WHERE clause: " + srv.msg(e)); return
      }
    if (pre.totalMatches > deleteMaxRows) {
      fail(ex, 400, s"Delete would affect ${pre.totalMatches} rows, " +
        s"exceeding max_rows_per_delete ($deleteMaxRows)"); return
    }
    if (!dryRun && pre.totalMatches > deleteConfirmationThreshold && !confirm) {
      fail(ex, 400, s"Delete affects ${pre.totalMatches} rows " +
        s"(> $deleteConfirmationThreshold): set confirm=true"); return
    }
    def files(paths: Seq[String]) = paths.map(q).mkString("[", ",", "]")
    if (dryRun) {
      ok(ex, 200,
        s"""{"success":true,"deleted_count":${pre.totalMatches},""" +
          s""""affected_files":${pre.affected.size},"rewritten_files":0,""" +
          s""""execution_time_ms":$ms,"dry_run":true,""" +
          s""""files_processed":${files(pre.affected.map(_.path))}}""")
      return
    }
    val res = TargetedDelete(catalog, db, meas, predicate, deleteMaxRows)
    srv.invalidateView(db, meas)
    ok(ex, 200,
      s"""{"success":true,"deleted_count":${res.rowsDeleted},""" +
        s""""affected_files":${res.filesProcessed.size},""" +
        s""""rewritten_files":${res.filesRewritten},""" +
        s""""execution_time_ms":$ms,"dry_run":false,""" +
        s""""files_processed":${files(res.filesProcessed)}}""")
  }

  /** GET /api/v1/delete/config (delete.go handleGetConfig). */
  private def handleDeleteConfig(ex: HttpExchange): Unit =
    ok(ex, 200,
      s"""{"enabled":$deleteEnabled,""" +
        s""""confirmation_threshold":$deleteConfirmationThreshold,""" +
        s""""max_rows_per_delete":$deleteMaxRows,""" +
        s""""implementation":"rewrite-based","performance_impact":{""" +
        s""""writes":"zero overhead","queries":"zero overhead",""" +
        s""""deletes":"expensive (file rewrites)"}}""")

  // ---- retention ----------------------------------------------------------

  private def handleRetentionList(ex: HttpExchange): Unit =
    ok(ex, 200, retentionStore.ids()
      .flatMap(id => retentionStore.get(id.toString))
      .map(render).mkString("[", ",", "]"))

  private def validateRetention(b: JsonNode): Either[String, ObjectNode] = {
    val name = oText(b, "name").getOrElse(return Left("name is required"))
    val db = oText(b, "database").getOrElse(return Left("database is required"))
    if (!catalog.isValidDatabaseName(db))
      return Left(s"invalid database name: $db")
    val days = oInt(b, "retention_days", -1)
    if (days < 1) return Left("retention_days must be >= 1")
    val node = mapper.createObjectNode()
    node.put("name", name)
    node.put("database", db)
    oText(b, "measurement") match {
      case Some(m) =>
        if (srv.MeasName.findFirstIn(m).isEmpty)
          return Left(s"invalid measurement name: $m")
        node.put("measurement", m)
      case None => node.putNull("measurement")
    }
    node.put("retention_days", days)
    node.put("buffer_days", oInt(b, "buffer_days", 0))
    node.put("is_active", oBool(b, "is_active", d = true))
    Right(node)
  }

  private def handleRetentionCreate(ex: HttpExchange): Unit =
    validateRetention(body(ex)) match {
      case Left(e) => fail(ex, 400, e)
      case Right(node) =>
        val name = node.get("name").asText
        val dup = retentionStore.ids().flatMap(i => retentionStore.get(i.toString))
          .exists(_.get("name").asText == name)
        if (dup) { fail(ex, 400, s"retention policy '$name' already exists"); return }
        node.putNull("last_execution_time")
        node.putNull("last_execution_status")
        node.putNull("last_deleted_count")
        node.put("created_at", nowIso())
        node.put("updated_at", nowIso())
        retentionStore.create(node)
        ok(ex, 201, render(node))
    }

  private def handleRetentionUpdate(ex: HttpExchange, id: Long): Unit =
    retentionStore.get(id.toString) match {
      case None => fail(ex, 404, s"retention policy not found: $id")
      case Some(old) => validateRetention(body(ex)) match {
        case Left(e) => fail(ex, 400, e)
        case Right(node) =>
          node.put("id", id)
          node.set[ObjectNode]("last_execution_time", old.get("last_execution_time"))
          node.set[ObjectNode]("last_execution_status", old.get("last_execution_status"))
          node.set[ObjectNode]("last_deleted_count", old.get("last_deleted_count"))
          node.set[ObjectNode]("created_at", old.get("created_at"))
          node.put("updated_at", nowIso())
          retentionStore.put(id.toString, node)
          ok(ex, 200, render(node))
      }
    }

  /** POST /api/v1/retention/:id/execute — dry-run lists what would
    * expire (partition paths + footer row counts, no data scan); the
    * real run deletes and records the execution (retention.go's
    * ExecuteRetentionRequest/Response). */
  private def handleRetentionExecute(ex: HttpExchange, id: Long): Unit = {
    val t0 = System.nanoTime()
    val pol = retentionStore.get(id.toString) match {
      case None => fail(ex, 404, s"retention policy not found: $id"); return
      case Some(p) => p
    }
    if (!retentionBusy.compareAndSet(false, true)) {
      fail(ex, 409, "retention execution already in progress"); return
    }
    try handleRetentionExecuteLocked(ex, id, pol, t0)
    finally retentionBusy.set(false)
  }

  private def handleRetentionExecuteLocked(ex: HttpExchange, id: Long,
      pol: ObjectNode, t0: Long): Unit = {
    val b = body(ex)
    val dryRun = oBool(b, "dry_run")
    val confirm = oBool(b, "confirm")
    if (!dryRun && !confirm) {
      fail(ex, 400, "Confirmation required. Set confirm=true or use dry_run=true.")
      return
    }
    val db = pol.get("database").asText
    val days = pol.get("retention_days").asInt
    val buffer = pol.get("buffer_days").asInt
    val measurements = oText(pol, "measurement").map(Seq(_))
      .getOrElse(catalog.listTables(db))
    val cutoff = Retention.cutoffHour(days, buffer, System.currentTimeMillis() * 1000L)
    val cutoffIso = Instant.ofEpochSecond(cutoff * 3600L).toString
    var filesDeleted = 0
    var rowsDeleted = 0L
    val affected = Seq.newBuilder[String]
    measurements.foreach { m =>
      val (exp, _) = Retention.expired(catalog, db, m, days, buffer)
      if (exp.nonEmpty) {
        affected += m
        val parquets = exp.flatMap { p =>
          val fs = p.getFileSystem(hconf)
          fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .map(_.getPath).toSeq
        }
        filesDeleted += parquets.size
        rowsDeleted += Compaction.footerRowCount(hconf, parquets)
        if (!dryRun) {
          Retention(catalog, db, m, days, buffer)
          srv.invalidateView(db, m)
        }
      }
    }
    val ms = (System.nanoTime() - t0) / 1e6
    if (!dryRun) {
      pol.put("last_execution_time", nowIso())
      pol.put("last_execution_status", "success")
      pol.put("last_deleted_count", rowsDeleted)
      pol.put("updated_at", nowIso())
      retentionStore.put(id.toString, pol)
      recordExec(s"retention/$id",
        s"""{"policy_id":$id,"execution_time":${q(nowIso())},""" +
          s""""status":"success","deleted_count":$rowsDeleted,""" +
          s""""cutoff_date":${q(cutoffIso)},"execution_duration_ms":$ms}""")
    }
    ok(ex, 200,
      s"""{"policy_id":$id,"policy_name":${q(pol.get("name").asText)},""" +
        s""""deleted_count":$rowsDeleted,"files_deleted":$filesDeleted,""" +
        s""""execution_time_ms":$ms,"dry_run":$dryRun,""" +
        s""""cutoff_date":${q(cutoffIso)},""" +
        s""""affected_measurements":${affected.result().map(q).mkString("[", ",", "]")}}""")
  }

  // ---- continuous queries ---------------------------------------------------

  private val IntervalRe: Regex = "([0-9]+)(ms|s|m|h|d)".r

  private def parseIntervalUs(s: String): Option[Long] = s.trim match {
    case IntervalRe(n, unit) =>
      val base = unit match {
        case "ms" => 1000L
        case "s" => 1000000L
        case "m" => 60L * 1000000L
        case "h" => 3600L * 1000000L
        case "d" => 24L * 3600L * 1000000L
      }
      Some(n.toLong * base)
    case _ => None
  }

  private def parseInstantUs(s: String): Option[Long] =
    (try Some(Instant.parse(s))
    catch {
      case _: Exception =>
        try Some(java.time.LocalDateTime
          .parse(s.replace(' ', 'T')).toInstant(java.time.ZoneOffset.UTC))
        catch { case _: Exception => None }
    }).map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)

  private def validateCq(b: JsonNode): Either[String, ObjectNode] = {
    val name = oText(b, "name").getOrElse(return Left("name is required"))
    val db = oText(b, "database").getOrElse(return Left("database is required"))
    val src = oText(b, "source_measurement")
      .getOrElse(return Left("source_measurement is required"))
    val dest = oText(b, "destination_measurement")
      .getOrElse(return Left("destination_measurement is required"))
    if (srv.MeasName.findFirstIn(dest).isEmpty)
      return Left("invalid destination_measurement: must start with a letter " +
        "and contain only alphanumerics, underscores, or hyphens")
    val query = oText(b, "query").getOrElse(return Left("query is required"))
    val interval = oText(b, "interval").getOrElse(return Left("interval is required"))
    if (parseIntervalUs(interval).isEmpty)
      return Left(s"invalid interval: $interval (use e.g. 30s, 5m, 1h, 1d)")
    if (!query.contains("{start_time}") || !query.contains("{end_time}"))
      return Left("query must contain {start_time} and {end_time} placeholders")
    val tags = oArr(b, "tag_columns")
    tags.find(t => !t.matches("[A-Za-z_][A-Za-z0-9_]*")) match {
      case Some(bad) => return Left(s"invalid tag column name: $bad")
      case None => ()
    }
    // the CQ body must itself be read-only: it runs verbatim on a tick
    // (substitute a dummy window so the placeholders parse)
    try srv.facade.requireReadOnly(srv.spark,
      ContinuousQuery.substitute(query, 0L, 1000000L))
    catch { case e: IllegalArgumentException => return Left(srv.msg(e)) }
    val node = mapper.createObjectNode()
    node.put("name", name)
    oText(b, "description") match {
      case Some(d) => node.put("description", d)
      case None => node.putNull("description")
    }
    node.put("database", db)
    node.put("source_measurement", src)
    node.put("destination_measurement", dest)
    node.put("query", query)
    node.put("interval", interval)
    val arr = node.putArray("tag_columns")
    tags.foreach(arr.add)
    node.put("is_active", oBool(b, "is_active", d = true))
    Right(node)
  }

  private def handleCqList(ex: HttpExchange): Unit = {
    val dbFilter = srv.queryParams(ex).get("database")
    ok(ex, 200, cqStore.ids().flatMap(i => cqStore.get(i.toString))
      .filter(n => dbFilter.forall(_ == n.get("database").asText))
      .map(render).mkString("[", ",", "]"))
  }

  private def handleCqCreate(ex: HttpExchange): Unit =
    validateCq(body(ex)) match {
      case Left(e) => fail(ex, 400, e)
      case Right(node) =>
        val name = node.get("name").asText
        val dup = cqStore.ids().flatMap(i => cqStore.get(i.toString))
          .exists(_.get("name").asText == name)
        if (dup) {
          fail(ex, 400, s"Continuous query with name '$name' already exists"); return
        }
        node.putNull("last_execution_time")
        node.putNull("last_execution_status")
        node.putNull("last_processed_time")
        node.putNull("last_records_written")
        node.put("created_at", nowIso())
        node.put("updated_at", nowIso())
        cqStore.create(node)
        ok(ex, 201, render(node))
    }

  private def handleCqUpdate(ex: HttpExchange, id: Long): Unit =
    cqStore.get(id.toString) match {
      case None => fail(ex, 404, s"continuous query not found: $id")
      case Some(old) => validateCq(body(ex)) match {
        case Left(e) => fail(ex, 400, e)
        case Right(node) =>
          node.put("id", id)
          Seq("last_execution_time", "last_execution_status",
            "last_processed_time", "last_records_written", "created_at")
            .foreach(f => node.set[ObjectNode](f, old.get(f)))
          node.put("updated_at", nowIso())
          cqStore.put(id.toString, node)
          ok(ex, 200, render(node))
      }
    }

  /** POST /api/v1/continuous_queries/:id/execute — explicit-window or
    * catch-up execution over the library CQ job; dry-run counts the
    * window's rows without writing (continuous_query.go's
    * ExecuteCQRequest/Response). */
  private def handleCqExecute(ex: HttpExchange, id: Long): Unit = {
    val t0 = System.nanoTime()
    val rec = cqStore.get(id.toString) match {
      case None => fail(ex, 404, s"continuous query not found: $id"); return
      case Some(r) => r
    }
    val b = body(ex)
    val dryRun = oBool(b, "dry_run")
    val db = rec.get("database").asText
    val dest = rec.get("destination_measurement").asText
    val query = rec.get("query").asText
    val name = rec.get("name").asText
    val intervalUs = parseIntervalUs(rec.get("interval").asText).get
    if (!catalog.listDatabases().contains(db)) {
      fail(ex, 404, s"database not found: $db"); return
    }
    srv.ensureViews(db)
    val (_, dbCat) = srv.sessionFor(db)
    val tags = (0 until rec.get("tag_columns").size())
      .map(rec.get("tag_columns").get(_).asText)
    val cqJob = ContinuousQuery(name, query, db, dest, tags)
    val explicit = (oText(b, "start_time"), oText(b, "end_time")) match {
      case (Some(s), Some(e)) =>
        (parseInstantUs(s), parseInstantUs(e)) match {
          case (Some(su), Some(eu)) if su < eu => Some((su, eu))
          case _ => fail(ex, 400, "invalid start_time/end_time"); return
        }
      case (None, None) => None
      case _ => fail(ex, 400, "start_time and end_time must be given together"); return
    }
    def ms = (System.nanoTime() - t0) / 1e6
    if (dryRun) {
      val (su, eu) = explicit.getOrElse {
        val now = System.currentTimeMillis() * 1000L
        (now - intervalUs, now)
      }
      // withSession: CQ SQL executes on an HTTP pool thread — the db
      // session must be ACTIVE there (see HttpServer.withSession)
      val rows = srv.withSession(dbCat.spark) {
        dbCat.spark.sql(ContinuousQuery.substitute(query, su, eu)).count()
      }
      ok(ex, 200,
        s"""{"success":true,"dry_run":true,"records_written":0,""" +
          s""""window_rows":$rows,"window_start":${q(isoOfUs(su))},""" +
          s""""window_end":${q(isoOfUs(eu))},"execution_time_ms":$ms}""")
      return
    }
    val execs = srv.withSession(dbCat.spark) {
      explicit match {
        case Some((su, eu)) => Seq(ContinuousQuery.execute(dbCat, cqJob, su, eu))
        case None =>
          ContinuousQuery.catchUp(dbCat, cqJob, intervalUs,
            System.currentTimeMillis() * 1000L)
      }
    }
    srv.invalidateView(db, dest)
    val written = execs.map(_.rows).sum
    val lastEnd = execs.lastOption.map(_.windowEndMicros)
    rec.put("last_execution_time", nowIso())
    rec.put("last_execution_status", "success")
    lastEnd.foreach(e => rec.put("last_processed_time", isoOfUs(e)))
    rec.put("last_records_written", written)
    rec.put("updated_at", nowIso())
    cqStore.put(id.toString, rec)
    recordExec(s"cq/$id",
      s"""{"cq_id":$id,"execution_time":${q(nowIso())},"status":"success",""" +
        s""""windows":${execs.size},"records_written":$written,""" +
        s""""execution_duration_ms":$ms}""")
    ok(ex, 200,
      s"""{"success":true,"dry_run":false,"windows":${execs.size},""" +
        s""""records_written":$written,""" +
        s""""last_processed_time":${lastEnd.map(e => q(isoOfUs(e))).getOrElse("null")},""" +
        s""""execution_time_ms":$ms}""")
  }

  private def isoOfUs(us: Long): String =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L).toString

  // ---- compaction -----------------------------------------------------------

  private def handleCompactionStatus(ex: HttpExchange): Unit =
    ok(ex, 200,
      s"""{"manager":{"active_jobs":${compActive.size},""" +
        s""""total_completed":${compCompleted.get},""" +
        s""""total_failed":${compFailed.get}},"schedulers":{}}""")

  /** GET /api/v1/compaction/candidates — hour partitions with enough
    * small files to merit a merge (compaction.go getCandidates). Pure
    * directory listings. */
  private def handleCompactionCandidates(ex: HttpExchange): Unit = {
    val params = srv.queryParams(ex)
    val minFiles = params.get("min_files").flatMap(_.toIntOption).getOrElse(2)
    val dbs = params.get("database").map(Seq(_)).getOrElse(catalog.listDatabases())
    val items = for {
      db <- dbs
      m <- catalog.listTables(db)
      p <- catalog.listHourPartitions(db, m)
      n = p.getFileSystem(hconf).listStatus(p)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if n >= minFiles
    } yield s"""{"database":${q(db)},"measurement":${q(m)},""" +
      s""""partition":${q(p.toString)},"file_count":$n}"""
    ok(ex, 200,
      s"""{"success":true,"candidates":${items.mkString("[", ",", "]")},""" +
        s""""count":${items.size}}""")
  }

  private def handleCompactionJobs(ex: HttpExchange): Unit =
    ok(ex, 200, compActive.toSeq.sortBy(_._1)
      .map { case (id, desc) => s"""{"job_id":$id,"description":${q(desc)}}""" }
      .mkString("""{"jobs":[""", ",", s"""],"count":${compActive.size}}"""))

  // one trigger at a time: two concurrent triggers over the same scope
  // would plan the same merge twice — the second's inputs vanish under
  // it mid-write. The manifest's per-table lock makes the SWAP safe;
  // this makes the PLAN safe. 409 mirrors "already running".
  private val compTriggerBusy = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** POST /api/v1/compaction/trigger — run the hourly and/or daily tier
    * NOW for the selected scope (compaction.go triggerCompaction). Runs
    * synchronously; per-partition merges fan out inside the job. */
  private def handleCompactionTrigger(ex: HttpExchange): Unit = {
    val t0 = System.nanoTime()
    val b = body(ex)
    val tier = oText(b, "tier").getOrElse("hourly")
    if (!Set("hourly", "daily", "all").contains(tier)) {
      fail(ex, 400, s"invalid tier: $tier (hourly|daily|all)"); return
    }
    val minFiles = oInt(b, "min_files", 2)
    // admin trigger forces NOW: age gates default off (the scheduler's
    // periodic ticks keep the conservative defaults)
    val minAgeHours = oInt(b, "min_age_hours", 0)
    val scope = oText(b, "database") match {
      case Some(db) =>
        if (!catalog.listDatabases().contains(db)) {
          fail(ex, 404, s"database not found: $db"); return
        }
        oText(b, "measurement") match {
          case Some(m) =>
            if (!catalog.listTables(db).contains(m)) {
              fail(ex, 404, s"measurement not found: $db/$m"); return
            }
            Seq((db, m))
          case None => catalog.listTables(db).map((db, _))
        }
      case None =>
        for (db <- catalog.listDatabases(); m <- catalog.listTables(db))
          yield (db, m)
    }
    if (!compTriggerBusy.compareAndSet(false, true)) {
      fail(ex, 409, "compaction trigger already running"); return
    }
    val jobId = compSeq.incrementAndGet()
    compActive.put(jobId, s"trigger tier=$tier scope=${scope.size} tables")
    try {
      val results = scope.flatMap { case (db, m) =>
        val recovered = Compaction.recover(catalog, db, m)
        val hourly =
          if (tier == "hourly" || tier == "all")
            Compaction.runHourly(catalog, db, m, minFiles, minAgeHours)
          else Nil
        val daily =
          if (tier == "daily" || tier == "all")
            Compaction.runDaily(catalog, db, m, minFiles, minAgeHours)
          else Nil
        val rs = hourly ++ daily
        if (rs.exists(_.compacted) || recovered.nonEmpty) srv.invalidateView(db, m)
        rs.filter(_.compacted).map(r =>
          s"""{"database":${q(db)},"measurement":${q(m)},""" +
            s""""partition":${q(r.partition)},"files_in":${r.filesIn},""" +
            s""""rows_in":${r.rowsIn},"rows_out":${r.rowsOut}}""")
      }
      compCompleted.incrementAndGet()
      val ms = (System.nanoTime() - t0) / 1e6
      val resp = s"""{"success":true,"job_id":$jobId,"tier":${q(tier)},""" +
        s""""compacted":${results.mkString("[", ",", "]")},""" +
        s""""count":${results.size},"execution_time_ms":$ms}"""
      compHistory.addLast(resp)
      while (compHistory.size() > ExecRingCap) compHistory.pollFirst()
      ok(ex, 200, resp)
    } catch {
      case e: Throwable => compFailed.incrementAndGet(); throw e
    } finally {
      compActive.remove(jobId)
      compTriggerBusy.set(false)
    }
  }

  // ---- tiering ---------------------------------------------------------------

  private def tierFiles(root: String, tier: String): Seq[(String, String, String, Long)] = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(hconf)
    if (!fs.exists(rp)) return Nil
    val it = fs.listFiles(rp, true)
    val b = Seq.newBuilder[(String, String, String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet")) {
        // {root}/{db}/{measurement}/year=…/… — db/meas from the relative path
        val rel = f.getPath.toUri.getPath.stripPrefix(rp.toUri.getPath).stripPrefix("/")
        val segs = rel.split('/')
        if (segs.length >= 3 && !segs(0).startsWith("_"))
          b += ((f.getPath.toString, segs(0), segs(1), f.getLen))
      }
    }
    b.result()
  }

  private def handleTieringStatus(ex: HttpExchange): Unit = {
    val hot = tierFiles(catalog.root, "hot")
    val cold = tierFiles(coldRoot, "cold")
    ok(ex, 200,
      s"""{"success":true,"tiers":{"hot":{"files":${hot.size},""" +
        s""""bytes":${hot.map(_._4).sum}},"cold":{"files":${cold.size},""" +
        s""""bytes":${cold.map(_._4).sum}}},"cold_root":${q(coldRoot)}}""")
  }

  private def handleTieringFiles(ex: HttpExchange): Unit = {
    val params = srv.queryParams(ex)
    val limit = params.get("limit").flatMap(_.toIntOption).getOrElse(100)
    val tierSel = params.get("tier")
    val dbSel = params.get("database")
    val all =
      (if (tierSel.forall(_ == "hot")) tierFiles(catalog.root, "hot").map(f => (f, "hot")) else Nil) ++
        (if (tierSel.forall(_ == "cold")) tierFiles(coldRoot, "cold").map(f => (f, "cold")) else Nil)
    val filtered = all.filter { case ((_, db, _, _), _) => dbSel.forall(_ == db) }
    val items = filtered.take(limit).map { case ((path, db, m, len), tier) =>
      s"""{"path":${q(path)},"tier":${q(tier)},"database":${q(db)},""" +
        s""""measurement":${q(m)},"size_bytes":$len}"""
    }
    ok(ex, 200,
      s"""{"success":true,"files":${items.mkString("[", ",", "]")},""" +
        s""""count":${filtered.size}}""")
  }

  /** POST /api/v1/tiering/migrate — move hour partitions older than
    * after_days to the cold root (tiering.go TriggerMigration) via the
    * library job; queries keep seeing both tiers (ensureViews registers
    * the hot∪cold union once a measurement has cold data). */
  private def handleTieringMigrate(ex: HttpExchange): Unit = {
    val t0 = System.nanoTime()
    val b = body(ex)
    val db = oText(b, "database").getOrElse {
      fail(ex, 400, "database is required"); return
    }
    if (!catalog.listDatabases().contains(db)) {
      fail(ex, 404, s"database not found: $db"); return
    }
    val afterDays = oInt(b, "after_days",
      effectivePolicy(db)._1)
    val ms = oText(b, "measurement").map(Seq(_)).getOrElse(catalog.listTables(db))
    val results = ms.map { m =>
      val r = Tiering.migrate(catalog, coldRoot, db, m, afterDays)
      if (r.migrated.nonEmpty) srv.invalidateView(db, m)
      s"""{"measurement":${q(m)},"migrated":${r.migrated.size},"kept":${r.kept}}"""
    }
    val elapsed = (System.nanoTime() - t0) / 1e6
    ok(ex, 200,
      s"""{"success":true,"database":${q(db)},"after_days":$afterDays,""" +
        s""""results":${results.mkString("[", ",", "]")},""" +
        s""""execution_time_ms":$elapsed}""")
  }

  /** POST /api/v1/tiering/scan — per-measurement tier census
    * (tiering.go ScanFiles). */
  private def handleTieringScan(ex: HttpExchange): Unit = {
    val byTable = (tierFiles(catalog.root, "hot").map(f => (f, "hot")) ++
      tierFiles(coldRoot, "cold").map(f => (f, "cold")))
      .groupBy { case ((_, db, m, _), _) => (db, m) }
    val items = byTable.toSeq.sortBy(_._1).map { case ((db, m), fs) =>
      val hot = fs.filter(_._2 == "hot")
      val cold = fs.filter(_._2 == "cold")
      s"""{"database":${q(db)},"measurement":${q(m)},""" +
        s""""hot_files":${hot.size},"hot_bytes":${hot.map(_._1._4).sum},""" +
        s""""cold_files":${cold.size},"cold_bytes":${cold.map(_._1._4).sum}}"""
    }
    ok(ex, 200,
      s"""{"success":true,"measurements":${items.mkString("[", ",", "]")},""" +
        s""""count":${items.size}}""")
  }

  private def effectivePolicy(db: String): (Int, Boolean, String) =
    tierPolicyStore.get(db) match {
      case Some(p) =>
        (oInt(p, "cold_after_days", defaultColdAfterDays),
          oBool(p, "enabled", d = true), "policy")
      case None => (defaultColdAfterDays, false, "default")
    }

  private def handleTierPolicyList(ex: HttpExchange): Unit =
    ok(ex, 200, tierPolicyStore.keys().flatMap(tierPolicyStore.get)
      .map(render).mkString("[", ",", "]"))

  private def handleTierPolicySet(ex: HttpExchange, db: String): Unit = {
    if (!catalog.isValidDatabaseName(db)) {
      fail(ex, 400, s"invalid database name: $db"); return
    }
    val b = body(ex)
    val days = oInt(b, "cold_after_days", defaultColdAfterDays)
    if (days < 0) { fail(ex, 400, "cold_after_days must be >= 0"); return }
    val node = mapper.createObjectNode()
    node.put("database", db)
    node.put("cold_after_days", days)
    node.put("enabled", oBool(b, "enabled", d = true))
    node.put("updated_at", nowIso())
    tierPolicyStore.put(db, node)
    ok(ex, 200, render(node))
  }

  private def handleTierPolicyEffective(ex: HttpExchange, db: String): Unit = {
    val (days, enabled, source) = effectivePolicy(db)
    ok(ex, 200,
      s"""{"database":${q(db)},"cold_after_days":$days,""" +
        s""""enabled":$enabled,"source":${q(source)}}""")
  }

  // ---- schedulers (scheduler.go:53-66) -------------------------------------

  /** GET /api/v1/schedulers — per-scheduler status built from the policy
    * stores (the reference reports its in-process scheduler objects;
    * here the definitions ARE the stores, so status = definition census
    * + last-execution fields persisted on the records). */
  private def handleSchedulers(ex: HttpExchange): Unit = {
    def census(store: Store): (Int, Int, String) = {
      val recs = store.ids().flatMap(i => store.get(i.toString))
      val active = recs.count(r => oBool(r, "is_active", d = true))
      val last = recs.flatMap(r => oText(r, "last_execution_time"))
        .sorted.lastOption.map(q).getOrElse("null")
      (recs.size, active, last)
    }
    val (cqN, cqA, cqLast) = census(cqStore)
    val (rN, rA, rLast) = census(retentionStore)
    ok(ex, 200,
      s"""{"cq_scheduler":{"enabled":${cqA > 0},"job_count":$cqN,""" +
        s""""active":$cqA,"last_execution_time":$cqLast},""" +
        s""""retention_scheduler":{"enabled":${rA > 0},"policy_count":$rN,""" +
        s""""active":$rA,"last_execution_time":$rLast},""" +
        s""""compaction_scheduler":{"active_jobs":${compActive.size},""" +
        s""""total_completed":${compCompleted.get},""" +
        s""""total_failed":${compFailed.get}}}""")
  }

  /** POST /api/v1/schedulers/cq/reload — definitions are re-read from
    * the store on every execute, so reload = re-census (scheduler.go
    * handleCQReload's envelope). */
  private def handleCqReload(ex: HttpExchange): Unit =
    ok(ex, 200,
      s"""{"message":"CQ scheduler reloaded successfully",""" +
        s""""job_count":${cqStore.ids().size}}""")

  /** POST /api/v1/schedulers/retention/trigger — run every ACTIVE
    * retention policy now (scheduler.go handleRetentionTrigger). */
  private def handleRetentionTriggerAll(ex: HttpExchange): Unit = {
    if (!retentionBusy.compareAndSet(false, true)) {
      fail(ex, 409, "retention execution already in progress"); return
    }
    try handleRetentionTriggerAllLocked(ex)
    finally retentionBusy.set(false)
  }

  private def handleRetentionTriggerAllLocked(ex: HttpExchange): Unit = {
    var deleted = 0L
    var executed = 0
    retentionStore.ids().flatMap(i => retentionStore.get(i.toString))
      .filter(r => oBool(r, "is_active", d = true))
      .foreach { pol =>
        val db = pol.get("database").asText
        if (catalog.listDatabases().contains(db)) {
          val days = pol.get("retention_days").asInt
          val buffer = pol.get("buffer_days").asInt
          val measurements = oText(pol, "measurement").map(Seq(_))
            .getOrElse(catalog.listTables(db))
          // per-policy delta: last_deleted_count records THIS policy's
          // rows, like the single-policy execute path — not the running
          // cross-policy total (r8 advice)
          var polDeleted = 0L
          measurements.foreach { m =>
            val (exp, _) = Retention.expired(catalog, db, m, days, buffer)
            if (exp.nonEmpty) {
              val parquets = exp.flatMap { p =>
                val fs = p.getFileSystem(hconf)
                fs.listStatus(p)
                  .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
                  .map(_.getPath).toSeq
              }
              polDeleted += Compaction.footerRowCount(hconf, parquets)
              Retention(catalog, db, m, days, buffer)
              srv.invalidateView(db, m)
            }
          }
          deleted += polDeleted
          executed += 1
          pol.put("last_execution_time", nowIso())
          pol.put("last_execution_status", "success")
          pol.put("last_deleted_count", polDeleted)
          pol.put("updated_at", nowIso())
          retentionStore.put(pol.get("id").asLong.toString, pol)
        }
      }
    ok(ex, 200,
      s"""{"message":"Retention triggered successfully",""" +
        s""""policies_executed":$executed,"deleted_count":$deleted}""")
  }

  // ---- MQTT ---------------------------------------------------------------

  private def subStatus(id: Long): String = mqttStatus.getOrElse(id, "stopped")

  private def subWithStatus(n: ObjectNode): ObjectNode = {
    val out = n.deepCopy()
    out.put("status", subStatus(n.get("id").asLong))
    out
  }

  private def handleMqttHealth(ex: HttpExchange): Unit = {
    val ids = mqttStore.ids()
    val running = ids.count(id => subStatus(id) == "running")
    val errored = ids.count(id => subStatus(id) == "error")
    ok(ex, 200,
      s"""{"status":${q(if (errored > 0) "degraded" else "ok")},""" +
        s""""healthy":${errored == 0},"subscriptions":${ids.size},""" +
        s""""running":$running}""")
  }

  private def handleMqttStats(ex: HttpExchange): Unit = {
    val subs = mqttStore.ids().flatMap(i => mqttStore.get(i.toString))
    var totalMsgs = 0L; var totalFailed = 0L
    var running = 0; var stopped = 0; var errored = 0
    val items = subs.map { n =>
      val id = n.get("id").asLong
      val st = subStatus(id)
      st match {
        case "running" => running += 1
        case "error" => errored += 1
        case _ => stopped += 1
      }
      val (recv, failed, reconn) = mqttRuntime.get(id)
        .map(s => (s.messagesReceived, s.messagesFailed, s.reconnects))
        .getOrElse((0L, 0L, 0L))
      totalMsgs += recv; totalFailed += failed
      s"""{"id":$id,"name":${q(n.get("name").asText)},"status":${q(st)},""" +
        s""""messages_received":$recv,"messages_failed":$failed,""" +
        s""""reconnects":$reconn}"""
    }
    ok(ex, 200,
      s"""{"success":true,"stats":{"subscriptions":${items.mkString("[", ",", "]")},""" +
        s""""summary":{"total_subscriptions":${subs.size},"running":$running,""" +
        s""""stopped":$stopped,"error":$errored,"total_messages":$totalMsgs,""" +
        s""""total_failed":$totalFailed}}}""")
  }

  private def validateSub(b: JsonNode): Either[String, ObjectNode] = {
    val name = oText(b, "name").getOrElse(return Left("name is required"))
    val host = oText(b, "broker_host").getOrElse(return Left("broker_host is required"))
    val port = oInt(b, "broker_port", 1883)
    if (port < 1 || port > 65535) return Left(s"invalid broker_port: $port")
    val topics = oArr(b, "topics")
    if (topics.isEmpty) return Left("topics is required (non-empty array)")
    val db = oText(b, "database").getOrElse("default")
    if (!catalog.isValidDatabaseName(db)) return Left(s"invalid database name: $db")
    val qos = oInt(b, "qos", 1)
    if (qos < 0 || qos > 1) return Left(s"unsupported qos: $qos (0 or 1)")
    val node = mapper.createObjectNode()
    node.put("name", name)
    node.put("broker_host", host)
    node.put("broker_port", port)
    val arr = node.putArray("topics")
    topics.foreach(arr.add)
    node.put("qos", qos)
    node.put("database", db)
    node.put("client_id", oText(b, "client_id").getOrElse(s"graft-sub-$name"))
    node.put("is_active", oBool(b, "is_active", d = true))
    Right(node)
  }

  private def handleSubList(ex: HttpExchange): Unit =
    ok(ex, 200, mqttStore.ids().flatMap(i => mqttStore.get(i.toString))
      .map(n => render(subWithStatus(n))).mkString("[", ",", "]"))

  private def handleSubGet(ex: HttpExchange, id: Long): Unit =
    mqttStore.get(id.toString) match {
      case Some(n) => ok(ex, 200, render(subWithStatus(n)))
      case None => fail(ex, 404, s"subscription not found: $id")
    }

  private def handleSubCreate(ex: HttpExchange): Unit =
    validateSub(body(ex)) match {
      case Left(e) => fail(ex, 400, e)
      case Right(node) =>
        val name = node.get("name").asText
        val dup = mqttStore.ids().flatMap(i => mqttStore.get(i.toString))
          .exists(_.get("name").asText == name)
        if (dup) { fail(ex, 409, s"subscription '$name' already exists"); return }
        node.put("created_at", nowIso())
        node.put("updated_at", nowIso())
        val id = mqttStore.create(node)
        mqttStatus.put(id, "stopped") // connect on explicit /start
        ok(ex, 201, render(subWithStatus(node)))
    }

  private def handleSubUpdate(ex: HttpExchange, id: Long): Unit =
    mqttStore.get(id.toString) match {
      case None => fail(ex, 404, s"subscription not found: $id")
      case Some(old) =>
        if (subStatus(id) == "running") {
          fail(ex, 409, "stop the subscription before updating it"); return
        }
        validateSub(body(ex)) match {
          case Left(e) => fail(ex, 400, e)
          case Right(node) =>
            node.put("id", id)
            node.set[ObjectNode]("created_at", old.get("created_at"))
            node.put("updated_at", nowIso())
            mqttStore.put(id.toString, node)
            ok(ex, 200, render(subWithStatus(node)))
        }
    }

  private def handleSubDelete(ex: HttpExchange, id: Long): Unit = {
    mqttRuntime.remove(id).foreach(s => try s.stop() catch { case _: Throwable => () })
    mqttStatus.remove(id)
    handleRemove(ex, mqttStore, id.toString, "subscription")
  }

  private def handleSubStats(ex: HttpExchange, id: Long): Unit =
    mqttStore.get(id.toString) match {
      case None => fail(ex, 404, s"subscription not found: $id")
      case Some(_) =>
        val (recv, failed, reconn) = mqttRuntime.get(id)
          .map(s => (s.messagesReceived, s.messagesFailed, s.reconnects))
          .getOrElse((0L, 0L, 0L))
        ok(ex, 200,
          s"""{"success":true,"id":$id,"status":${q(subStatus(id))},""" +
            s""""messages_received":$recv,"messages_failed":$failed,""" +
            s""""reconnects":$reconn}""")
    }

  /** start/stop/pause/restart a subscription's live subscriber
    * (mqtt_subscriptions.go:55-58). start connects immediately and fails
    * the request if the broker is unreachable (the subscriber's
    * fail-fast contract); pause is stop-that-stays-listed-as-paused. */
  private def handleSubLifecycle(ex: HttpExchange, id: Long, act: String): Unit = {
    val rec = mqttStore.get(id.toString) match {
      case None => fail(ex, 404, s"subscription not found: $id"); return
      case Some(r) => r
    }
    def stopIt(): Unit =
      mqttRuntime.remove(id).foreach(s => try s.stop() catch { case _: Throwable => () })
    def startIt(): Unit = {
      val topics = (0 until rec.get("topics").size()).map(rec.get("topics").get(_).asText)
      val sub = new MqttSubscriber(catalog,
        rec.get("database").asText,
        rec.get("broker_host").asText,
        rec.get("broker_port").asInt,
        topics,
        clientId = rec.get("client_id").asText,
        qos = rec.get("qos").asInt)
      try {
        sub.start()
        mqttRuntime.put(id, sub)
        mqttStatus.put(id, "running")
      } catch {
        case e: Throwable =>
          mqttStatus.put(id, "error")
          throw new IllegalStateException(
            s"failed to connect subscription $id: ${srv.msg(e)}")
      }
    }
    act match {
      case "start" =>
        if (subStatus(id) == "running") { fail(ex, 409, "already running"); return }
        startIt()
      case "stop" => stopIt(); mqttStatus.put(id, "stopped")
      case "pause" => stopIt(); mqttStatus.put(id, "paused")
      case "restart" => stopIt(); startIt()
    }
    ok(ex, 200,
      s"""{"success":true,"id":$id,"status":${q(subStatus(id))}}""")
  }

  // ---- backup/restore (internal/backup + api/backup_routes.go) -----------

  /** Backups land under `{root}/_backups` unless re-pointed (underscore
    * prefix keeps the tree out of database listings and out of its own
    * backups). */
  @volatile var backupRoot: String = new Path(catalog.root, "_backups").toString

  // single-flight: the reference serializes backup/restore through one
  // Manager mutex and 409s a second request (backup_routes.go:58)
  private val backupBusy = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var backupProgress: Option[String] = None

  private def setBackupProgress(op: String, id: String, status: String,
      startedAt: String, error: Option[String] = None): Unit =
    backupProgress = Some(
      s"""{"operation":${q(op)},"backup_id":${q(id)},"status":${q(status)},""" +
        s""""started_at":${q(startedAt)}""" +
        error.map(e => s""","error":${q(e)}""").getOrElse("") + "}")

  private def runBackupOp(ex: HttpExchange, op: String, id: String)
      (work: => Unit): Unit = {
    if (!backupBusy.compareAndSet(false, true)) {
      ok(ex, 409,
        s"""{"error":"A backup or restore operation is already in progress","status":"running","operation":${q(op)}}""")
      return
    }
    val started = nowIso()
    setBackupProgress(op, id, "running", started)
    val t = new Thread(() => {
      try { work; setBackupProgress(op, id, "completed", started) }
      catch { case e: Throwable =>
        setBackupProgress(op, id, "failed", started, Some(srv.msg(e)))
      } finally backupBusy.set(false)
    }, s"graft-$op")
    t.setDaemon(true)
    t.start()
    // 202 + poll /status, the reference's async contract
    ok(ex, 202,
      s"""{"message":"${op.capitalize} started","status":"running","backup_id":${q(id)}}""")
  }

  private def handleBackupCreate(ex: HttpExchange): Unit = {
    val n = body(ex)
    val includeMeta = oBool(n, "include_metadata", d = true)
    val id = s"backup-${System.currentTimeMillis()}"
    runBackupOp(ex, "backup", id) {
      graft.jobs.Backup.create(catalog, backupRoot, id,
        includeMetadata = includeMeta)
      ()
    }
  }

  private def handleBackupRestore(ex: HttpExchange): Unit = {
    val n = body(ex)
    val id = oText(n, "backup_id").getOrElse {
      fail(ex, 400, "backup_id is required"); return
    }
    // same charset the GET/DELETE path regex enforces — a traversal id
    // ("../..") would resolve outside backupRoot and restore an
    // arbitrary tree over the catalog (reference validBackupID)
    if (!id.matches("[A-Za-z0-9_-]+")) {
      fail(ex, 400, "Invalid backup ID format"); return
    }
    if (!oBool(n, "confirm")) {
      fail(ex, 400, "Restore requires confirm: true"); return
    }
    val data = oBool(n, "restore_data", d = true)
    val meta = oBool(n, "restore_metadata", d = true)
    val ice = oBool(n, "restore_iceberg_metadata", d = true)
    runBackupOp(ex, "restore", id) {
      val res = graft.jobs.Backup.restore(catalog, backupRoot, id,
        restoreData = data, restoreMetadata = meta, restoreIceberg = ice)
      // restored files replace what live views may have snapshot-listed
      res.databases.foreach { db =>
        catalog.listTables(db).foreach(m => srv.invalidateView(db, m))
      }
    }
  }

  private def handleBackupStatus(ex: HttpExchange): Unit =
    ok(ex, 200, backupProgress.getOrElse("""{"status":"idle"}"""))

  private def handleBackupList(ex: HttpExchange): Unit = {
    import org.json4s._
    val summaries = graft.jobs.Backup.list(srv.spark, backupRoot).map { m =>
      def s(f: String) = (m \ f) match {
        case JString(v) => q(v); case v => org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(v))
      }
      s"""{"backup_id":${s("backup_id")},"created_at":${s("created_at")},""" +
        s""""backup_type":${s("backup_type")},"total_files":${s("total_files")},""" +
        s""""total_size_bytes":${s("total_size_bytes")},""" +
        s""""database_count":${(m \ "databases").children.size}}"""
    }
    ok(ex, 200,
      s"""{"backups":${summaries.mkString("[", ",", "]")},"count":${summaries.size}}""")
  }

  private def handleBackupGet(ex: HttpExchange, id: String): Unit = {
    val p = new Path(new Path(backupRoot, id), "manifest.json")
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) { fail(ex, 404, "Backup not found"); return }
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    ok(ex, 200, org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.jackson.JsonMethods.parse(text))))
  }

  private def handleBackupDelete(ex: HttpExchange, id: String): Unit = {
    val p = new Path(backupRoot, id)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) { fail(ex, 404, "Backup not found"); return }
    fs.delete(p, true)
    ok(ex, 200, s"""{"message":"Backup deleted","backup_id":${q(id)}}""")
  }
}
