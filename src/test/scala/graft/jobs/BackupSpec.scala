package graft.jobs

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.ingest.HourPartitionedWriter
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.json4s.JString

/** Manifest-based backup/restore (r8 verdict "What's missing" #2):
  * ingest → backup → destroy → restore → the roundtrip query
  * hash-matches, admin records and Iceberg metadata ride along. */
class BackupSpec extends SparkSpec {

  private val base = 1717200000000000L

  private def writeRows(cat: GraftCatalog, db: String, m: String, n: Int): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i =>
      (base + i * 1000000L, s"h${i % 3}", i * 1.5))
      .toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
    HourPartitionedWriter.write(cat, db, m, df)
  }

  private def snapshot(cat: GraftCatalog, db: String, m: String): Seq[String] =
    cat.table(db, m).orderBy("time", "host")
      .collect().map(_.toString).toSeq

  test("ingest -> backup -> destroy -> restore roundtrips data, metadata, and iceberg") {
    val root = tmpDir("graft_bak_cat")
    val bak = tmpDir("graft_bak_dest")
    val cat = new GraftCatalog(spark, root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

    writeRows(cat, "default", "cpu", 20)
    writeRows(cat, "dbx", "mem", 7)
    IcebergExport.reconcile(cat, "default", "cpu")
    // an _admin record (the reference backs up its SQLite sidecar)
    val adminRec = new Path(root, "_admin/retention/1.json")
    fs.mkdirs(adminRec.getParent)
    val out = fs.create(adminRec, true)
    out.write("""{"id":1,"database":"default","retention_days":30}""".getBytes("UTF-8"))
    out.close()

    val before = snapshot(cat, "default", "cpu")
    val beforeX = snapshot(cat, "dbx", "mem")

    val res = Backup.create(cat, bak, "backup-t1")
    assert(res.skipped == 0 && res.files > 0)
    assert(res.databases.sorted == Seq("dbx", "default").sorted)

    // manifest inventories both databases with per-measurement counts
    val manifest = Backup.list(spark, bak).last
    assert((manifest \ "backup_id") == JString("backup-t1"))
    val dbNames = (manifest \ "databases").children
      .map(d => (d \ "name").asInstanceOf[JString].s).sorted
    assert(dbNames == Seq("dbx", "default").sorted)
    assert((manifest \ "has_metadata") == org.json4s.JBool(true))
    assert((manifest \ "has_iceberg_metadata") == org.json4s.JBool(true))

    // destroy everything under the catalog root
    fs.delete(new Path(root, "default"), true)
    fs.delete(new Path(root, "dbx"), true)
    fs.delete(new Path(root, "_admin"), true)
    fs.delete(new Path(root, "_iceberg"), true)
    spark.catalog.clearCache()
    assert(cat.listDatabases().isEmpty)

    val restored = Backup.restore(cat, bak, "backup-t1")
    assert(restored.skipped == 0 && restored.files == res.files)

    assert(snapshot(cat, "default", "cpu") == before,
      "restored data must hash-match the original")
    assert(snapshot(cat, "dbx", "mem") == beforeX)
    assert(fs.exists(adminRec), "admin metadata must be restored")
    assert(fs.exists(new Path(root,
      "_iceberg/default/cpu/metadata/version-hint.text")),
      "iceberg metadata must be restored")
  }

  test("restore with restore_metadata=false leaves _admin alone") {
    val root = tmpDir("graft_bak_cat2")
    val bak = tmpDir("graft_bak_dest2")
    val cat = new GraftCatalog(spark, root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeRows(cat, "default", "cpu", 5)
    val adminRec = new Path(root, "_admin/cq/1.json")
    fs.mkdirs(adminRec.getParent)
    val out = fs.create(adminRec, true); out.write("{}".getBytes); out.close()
    Backup.create(cat, bak, "backup-t2")
    fs.delete(new Path(root, "default"), true)
    fs.delete(new Path(root, "_admin"), true)
    Backup.restore(cat, bak, "backup-t2", restoreMetadata = false)
    assert(cat.table("default", "cpu").count() == 5)
    assert(!fs.exists(adminRec), "metadata must not be restored when opted out")
  }

  test("iceberg metadata restores under its own flag, without the data tree") {
    val root = tmpDir("graft_bak_cat4")
    val bak = tmpDir("graft_bak_dest4")
    val cat = new GraftCatalog(spark, root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeRows(cat, "default", "cpu", 6)
    IcebergExport.reconcile(cat, "default", "cpu")
    val hint = new Path(root, "_iceberg/default/cpu/metadata/version-hint.text")
    assert(fs.exists(hint))
    Backup.create(cat, bak, "backup-t4")
    val before = snapshot(cat, "default", "cpu")
    fs.delete(new Path(root, "_iceberg"), true)
    // metadata-only restore: _iceberg/ comes back, data untouched
    Backup.restore(cat, bak, "backup-t4",
      restoreData = false, restoreMetadata = false)
    assert(fs.exists(hint), "iceberg tree must restore without the data tree")
    assert(snapshot(cat, "default", "cpu") == before,
      "restored catalog must still resolve the table")
    // and the flag opts OUT independently
    fs.delete(new Path(root, "_iceberg"), true)
    Backup.restore(cat, bak, "backup-t4", restoreIceberg = false)
    assert(!fs.exists(hint), "restore_iceberg_metadata=false must skip _iceberg/")
    assert(cat.table("default", "cpu").count() == 6)
  }

  test("backups under the catalog root never back themselves up") {
    val root = tmpDir("graft_bak_cat3")
    val cat = new GraftCatalog(spark, root)
    writeRows(cat, "default", "cpu", 5)
    val bak = new Path(root, "_backups").toString // the AdminApi default
    val first = Backup.create(cat, bak, "backup-a")
    val second = Backup.create(cat, bak, "backup-b")
    assert(second.files == first.files,
      "a second backup must not recurse into _backups")
  }

  test("list() skips an in-progress/unparsable manifest instead of failing (r13 review)") {
    val root = tmpDir("graft_bak_cat4")
    val cat = new GraftCatalog(spark, root)
    writeRows(cat, "default", "cpu", 5)
    val bak = tmpDir("graft_bak_list")
    Backup.create(cat, bak, "backup-good")
    // a backup caught mid-write: directory + garbage manifest
    val conf = spark.sparkContext.hadoopConfiguration
    val badDir = new Path(bak, "backup-inflight")
    val fs = badDir.getFileSystem(conf)
    fs.mkdirs(badDir)
    val out = fs.create(new Path(badDir, "manifest.json"), true)
    try out.write("{not json".getBytes("UTF-8")) finally out.close()
    val manifests = Backup.list(spark, bak)
    assert(manifests.length == 1, s"expected only the complete backup, got $manifests")
    // and the completed backup leaves no manifest tmp behind
    assert(!fs.exists(new Path(s"$bak/backup-good/.manifest.json.tmp")))
  }
}
