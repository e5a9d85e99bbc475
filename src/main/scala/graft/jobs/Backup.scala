package graft.jobs

import graft.catalog.GraftCatalog
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.json4s.{JArray, JInt, JObject, JString, JValue}

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

/** Manifest-based full backup + restore — the reference's
  * internal/backup (backup.go CreateBackup, restore.go RestoreBackup,
  * manifest.go Manifest) re-expressed over the engine's storage layout:
  *
  *  - data = every `.parquet` under `{root}/{db}/{measurement}/…`,
  *    inventoried per database/measurement in the manifest;
  *  - metadata = the `_admin` record tree (retention/CQ/tiering/MQTT
  *    policies, auth tokens, RBAC records — the analog of the
  *    reference's SQLite sidecar, backup.go backupSQLite);
  *  - Iceberg metadata = the `_iceberg` tree (2026.09.1: the exported
  *    catalog must ride along or restored tables lose their snapshot
  *    pointers — the reference had exactly this bug when its backup
  *    filtered to `.parquet` only, backup.go:113-120).
  *
  * Files land under `{backupRoot}/{backupId}/files/<path relative to
  * root>` plus a `manifest.json`, so a backup is a self-describing
  * directory on any Hadoop filesystem (file://, s3a://, abfs://).
  *
  * Scale shape: the reference streams every file through one process
  * (streamBackupFile) — fine for its single node, a bottleneck for a
  * 100 TB warehouse. Here the copy fans out over the cluster: the file
  * list parallelizes into `copySlices` tasks and each executor streams
  * its slice FS-to-FS (distcp's shape), so backup bandwidth scales with
  * the cluster, not the driver. A file that vanishes mid-copy (active
  * compaction/retention) is counted in `skipped_files` — the manifest
  * says so, matching the reference's skip accounting (backup.go:343).
  */
object Backup {

  final case class Copied(files: Long, bytes: Long, skipped: Long)

  /** One backup or restore outcome: the parsed manifest + copy counts. */
  final case class Result(backupId: String, files: Long, bytes: Long,
      skipped: Long, databases: Seq[String])

  private def fsOf(p: Path, conf: Configuration) = p.getFileSystem(conf)

  /** True when any path component is a transient work dir (compaction /
    * targeted-delete staging) — leaf-name checks alone let part files
    * INSIDE those dirs leak into backups and snapshots. */
  private[jobs] def hasTmpComponent(p: Path): Boolean = {
    var cur = p.getParent
    var found = false
    while (cur != null && !found) {
      val n = cur.getName
      found = n.startsWith("_compact_tmp_") || n.startsWith("_delete_tmp_") ||
        n.startsWith("_flush_tmp_")
      cur = cur.getParent
    }
    found
  }

  private def listFilesRec(conf: Configuration, dir: Path,
      keep: Path => Boolean): Seq[(String, Long)] = {
    val fs = fsOf(dir, conf)
    if (!fs.exists(dir)) return Nil
    val it = fs.listFiles(dir, true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && keep(f.getPath)) buf += ((f.getPath.toString, f.getLen))
    }
    buf.result()
  }

  /** Distributed FS-to-FS copy of (src, destRelative) pairs rooted at
    * `destRoot`. Hadoop `Configuration` is not serializable, so its
    * entries ship as a Map and each task rebuilds one. Returns copy
    * counts; missing sources are skipped, short/changed reads fail. */
  private def copyAll(catalog: GraftCatalog, pairs: Seq[(String, String)],
      destRoot: String): Copied = {
    if (pairs.isEmpty) return Copied(0, 0, 0)
    val sc = catalog.spark.sparkContext
    val confMap: Map[String, String] = {
      val it = sc.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val slices = math.min(pairs.length, sc.defaultParallelism * 2).max(1)
    val counts = sc.parallelize(pairs, slices).mapPartitions { it =>
      val conf = new Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      var files = 0L; var bytes = 0L; var skipped = 0L
      it.foreach { case (src, rel) =>
        val srcPath = new Path(src)
        val srcFs = srcPath.getFileSystem(conf)
        val destPath = new Path(destRoot, rel)
        val destFs = destPath.getFileSystem(conf)
        // a source vanishing between the exists probe and the open (or
        // mid-inventory — active compaction/retention) is the DOCUMENTED
        // skip case, so the open itself must tolerate the race too
        val inOpt =
          if (!srcFs.exists(srcPath)) None
          else try Some(srcFs.open(srcPath))
          catch { case _: java.io.FileNotFoundException => None }
        inOpt match {
          case None => skipped += 1
          case Some(in) =>
            destFs.mkdirs(destPath.getParent)
            val tmp = new Path(destPath.getParent, s".${destPath.getName}.tmp")
            val out = destFs.create(tmp, true)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n >= 0) { out.write(buf, 0, n); bytes += n; n = in.read(buf) }
            } finally { out.close(); in.close() }
            // visible-only-when-complete: same tmp+rename every other
            // writer in this engine uses
            if (destFs.exists(destPath)) destFs.delete(destPath, false)
            destFs.rename(tmp, destPath)
            files += 1
        }
      }
      Iterator((files, bytes, skipped))
    }.collect()
    Copied(counts.map(_._1).sum, counts.map(_._2).sum, counts.map(_._3).sum)
  }

  private def relOf(root: String, full: String): String = {
    val r = new Path(root).toUri.getPath.stripSuffix("/")
    val f = new Path(full).toUri.getPath
    f.stripPrefix(r).stripPrefix("/")
  }

  /** Full backup of `catalog` into `{backupRoot}/{backupId}`. */
  def create(catalog: GraftCatalog, backupRoot: String,
      backupId: String = s"backup-${System.currentTimeMillis()}",
      includeMetadata: Boolean = true): Result = {
    val conf = catalog.spark.sparkContext.hadoopConfiguration

    // inventory: per-database/measurement parquet (manifest.go DatabaseInfo).
    // BOTH tiers: after daily compaction, everything older than ~a day
    // lives in the {m}__daily sibling tree — a backup blind to it loses
    // all historical rows on restore. The _graft_meta.properties sidecar
    // rides along too (tag/dedup/sort layout — without it a restored
    // catalog compacts with last-write-wins dedup silently OFF). In-flight
    // _compact_tmp_*/_delete_tmp_* trees are excluded by PATH component,
    // not just leaf name: their part files are transient state.
    val dbs = catalog.listDatabases().sorted.map { db =>
      val meas = catalog.listTables(db).sorted.map { m =>
        val keep = (p: Path) =>
          (p.getName.endsWith(".parquet") || p.getName == "_graft_meta.properties") &&
            (p.getName == "_graft_meta.properties" || !p.getName.startsWith("_")) &&
            !hasTmpComponent(p)
        val files =
          listFilesRec(conf, new Path(catalog.tablePath(db, m)), keep) ++
            listFilesRec(conf, new Path(catalog.dailyPath(db, m)), keep)
        (m, files)
      }
      (db, meas)
    }
    val dataFiles = for {
      (db, meas) <- dbs; (_, files) <- meas; f <- files
    } yield f
    val adminFiles = if (includeMetadata)
      listFilesRec(conf, new Path(catalog.root, "_admin"),
        p => !p.getName.startsWith(".")) else Nil
    val icebergFiles =
      listFilesRec(conf, new Path(catalog.root, "_iceberg"),
        p => !p.getName.startsWith("."))

    val all = (dataFiles ++ adminFiles ++ icebergFiles)
      .map { case (p, _) => (p, s"files/${relOf(catalog.root, p)}") }
    val dest = new Path(backupRoot, backupId).toString
    val copied = copyAll(catalog, all, dest)

    val manifest: JValue = JObject(
      "version" -> JString("1"),
      "backup_id" -> JString(backupId),
      "created_at" -> JString(Instant.now().toString),
      "backup_type" -> JString("full"),
      "databases" -> JArray(dbs.map { case (db, meas) =>
        JObject(
          "name" -> JString(db),
          "measurements" -> JArray(meas.map { case (m, files) =>
            JObject("name" -> JString(m),
              "file_count" -> JInt(files.length),
              "size_bytes" -> JInt(BigInt(files.map(_._2).sum)))
          }.toList),
          "file_count" -> JInt(meas.map(_._2.length).sum),
          "size_bytes" -> JInt(BigInt(meas.flatMap(_._2.map(_._2)).sum)))
      }.toList),
      "total_files" -> JInt(BigInt(copied.files)),
      "total_size_bytes" -> JInt(BigInt(copied.bytes)),
      "skipped_files" -> JInt(BigInt(copied.skipped)),
      "has_metadata" -> org.json4s.JBool(adminFiles.nonEmpty),
      "has_iceberg_metadata" -> org.json4s.JBool(icebergFiles.nonEmpty))
    // manifest last and via tmp+rename: list() treats the manifest as
    // the backup's existence marker, so it must never be visible
    // half-written (a concurrent list() would fail parsing it)
    val fs = fsOf(new Path(dest), conf)
    val mTmp = new Path(dest, ".manifest.json.tmp")
    val out = fs.create(mTmp, true)
    try out.write(JsonMethods.pretty(manifest).getBytes(UTF_8))
    finally out.close()
    val mFinal = new Path(dest, "manifest.json")
    if (fs.exists(mFinal)) fs.delete(mFinal, false)
    fs.rename(mTmp, mFinal)
    Result(backupId, copied.files, copied.bytes, copied.skipped,
      dbs.map(_._1))
  }

  /** Manifests of every backup under `backupRoot`, oldest first. */
  def list(spark: org.apache.spark.sql.SparkSession,
      backupRoot: String): Seq[JValue] = {
    val root = new Path(backupRoot)
    val fs = fsOf(root, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
      .flatMap { d =>
        val mp = new Path(d, "manifest.json")
        if (!fs.exists(mp)) None
        else {
          // tmp+rename makes a half-written manifest unlikely, but on
          // object stores rename is copy+delete — an unparsable one is
          // an in-progress backup, not a reason to fail the listing
          val in = fs.open(mp)
          try scala.util.Try(
            JsonMethods.parse(new String(in.readAllBytes(), UTF_8))).toOption
          finally in.close()
        }
      }.toSeq
  }

  /** Restore `{backupRoot}/{backupId}` into the catalog root. Existing
    * files at the same relative paths are overwritten (restore.go
    * restoreDataFiles); files the backup doesn't know are left alone. */
  def restore(catalog: GraftCatalog, backupRoot: String, backupId: String,
      restoreData: Boolean = true, restoreMetadata: Boolean = true,
      restoreIceberg: Boolean = true): Result = {
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    val src = new Path(backupRoot, backupId)
    val fs = fsOf(src, conf)
    require(fs.exists(new Path(src, "manifest.json")),
      s"backup not found: $backupId")
    val filesRoot = new Path(src, "files")
    val entries = listFilesRec(conf, filesRoot, _ => true).map(_._1)
      .map(p => (p, relOf(filesRoot.toString, p)))
      .filter { case (_, rel) =>
        // three disjoint trees, each under its own flag: the exported
        // Iceberg catalog (`_iceberg/`) is metadata a restored table
        // needs to resolve snapshots (RELEASE_NOTES_2026.09.1), so it
        // must be restorable WITHOUT also copying the data tree back
        if (rel.startsWith("_admin/")) restoreMetadata
        else if (rel.startsWith("_iceberg/")) restoreIceberg
        else restoreData
      }
    val copied = copyAll(catalog, entries, catalog.root)
    val manifest = {
      val in = fs.open(new Path(src, "manifest.json"))
      try JsonMethods.parse(new String(in.readAllBytes(), UTF_8))
      finally in.close()
    }
    val dbs = (manifest \ "databases").children
      .map(d => (d \ "name").asInstanceOf[JString].s)
    Result(backupId, copied.files, copied.bytes, copied.skipped, dbs)
  }
}
