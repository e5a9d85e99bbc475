package graft.jobs

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.ingest.HourPartitionedWriter
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Structural conformance of the Iceberg v2 export (no official reader
  * exists in this offline environment — documented in the exporter):
  * Hadoop-catalog discovery files, metadata required keys, manifest-list
  * and manifest Avro decode, spec field-ids, snapshot lineage across
  * reconciles, and file-set equality with the measurement.
  */
class IcebergExportSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def writeRows(cat: GraftCatalog, n: Int, offset: Long = 0L): Unit = {
    import spark.implicits._
    val base = 1717200000000000L
    val df = (0 until n).map(i =>
      (base + offset + i * 1000000L, s"h${i % 3}", i * 1.5))
      .toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
    HourPartitionedWriter.write(cat, "default", "ice_m", df)
  }

  test("reconcile writes a spec-shaped v2 table; second reconcile chains the snapshot") {
    val cat = new GraftCatalog(spark, tmpDir("ice_cat"))
    writeRows(cat, 10)
    val r1 = IcebergExport.reconcile(cat, "default", "ice_m")
    assert(r1.version == 1 && r1.rows == 10 && r1.files >= 1)

    val conf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(s"${cat.root}/_iceberg/default/ice_m/metadata")
    val fs = metaDir.getFileSystem(conf)

    // discovery files (Hadoop convention the reference verified readers use)
    def readStr(p: Path) = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    assert(readStr(new Path(metaDir, "version-hint.text")).trim == "1")
    val meta = JsonMethods.parse(readStr(new Path(metaDir, "v1.metadata.json")))
    for (k <- Seq("format-version", "table-uuid", "location",
        "last-sequence-number", "last-updated-ms", "last-column-id",
        "current-schema-id", "schemas", "default-spec-id", "partition-specs",
        "last-partition-id", "default-sort-order-id", "sort-orders",
        "properties", "current-snapshot-id", "snapshots", "snapshot-log"))
      assert((meta \ k) != JNothing, s"metadata missing required key $k")
    assert((meta \ "format-version") == JInt(2))

    // schema: data columns only (no hive partition cols), ids 1..n
    val fields = (meta \ "schemas")(0) \ "fields"
    val names = fields.children.map(f => (f \ "name").asInstanceOf[JString].s)
    assert(names.toSet == Set("time", "host", "v"), names.toString)
    assert((meta \ "properties" \ "schema.name-mapping.default") != JNothing)

    // manifest list decodes and points at the manifest
    val snapPath = (meta \ "snapshots")(0) \ "manifest-list" match {
      case JString(s) => new Path(s)
      case other => fail(s"manifest-list: $other")
    }
    val (listMeta, listRecs) = IcebergExport.readAvro(fs, snapPath)
    assert(listMeta("format-version") == "2")
    assert(listRecs.length == 1)
    val manifestPath = new Path(listRecs.head.get("manifest_path").toString)
    assert(listRecs.head.get("added_rows_count").asInstanceOf[Long] == 10L)

    // manifest decodes; entries carry spec field-ids and the real files
    val (mMeta, mRecs) = IcebergExport.readAvro(fs, manifestPath)
    assert(mMeta("format-version") == "2" && mMeta("content") == "data")
    val entrySchema = mRecs.head.getSchema
    assert(entrySchema.getField("status").getObjectProp("field-id") == 0)
    val dfSchema = entrySchema.getField("data_file").schema()
    assert(dfSchema.getField("file_path").getObjectProp("field-id") == 100)
    assert(dfSchema.getField("record_count").getObjectProp("field-id") == 103)
    val listed = mRecs.map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .map(df => df.get("file_path").toString).toSet
    val actual = {
      val it = fs.listFiles(new Path(cat.tablePath("default", "ice_m")), true)
      val buf = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf.toSet
    }
    assert(listed == actual, s"manifest files != measurement files:\n$listed\n$actual")
    assert(mRecs.map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == 10L)

    // second reconcile after more data: version 2, parent chained, ids stable
    writeRows(cat, 5, offset = 7200L * 1000000L)
    val r2 = IcebergExport.reconcile(cat, "default", "ice_m")
    assert(r2.version == 2 && r2.rows == 15)
    val meta2 = JsonMethods.parse(readStr(new Path(metaDir, "v2.metadata.json")))
    assert(readStr(new Path(metaDir, "version-hint.text")).trim == "2")
    val snaps = (meta2 \ "snapshots").children
    assert(snaps.length == 2)
    val parent = snaps(1) \ "parent-snapshot-id"
    assert(parent == snaps(0) \ "snapshot-id", s"lineage broken: $parent")
    val ids2 = ((meta2 \ "schemas")(0) \ "fields").children
      .map(f => (f \ "name").asInstanceOf[JString].s -> (f \ "id")).toMap
    val ids1 = fields.children.map(f => (f \ "name").asInstanceOf[JString].s -> (f \ "id")).toMap
    assert(ids2 == ids1, "field ids must be stable across reconciles")

    // bounded history, no dangling references: after enough reconciles to
    // roll past the retention window, every snapshot still listed in the
    // metadata must point at a manifest-list file that exists, the
    // snapshots array must not grow without bound, and last-column-id
    // still covers every field id
    // retain_snapshots=3 (the reference's iceberg.retain_snapshots knob,
    // default 10) so four more reconciles roll past the window
    val rLast = (3 to 6).map { _ =>
      writeRows(cat, 1, offset = 9000L * 1000000L)
      IcebergExport.reconcile(cat, "default", "ice_m", retainSnapshots = 3)
    }.last
    val metaN = JsonMethods.parse(readStr(new Path(metaDir, s"v${rLast.version}.metadata.json")))
    val snapsN = (metaN \ "snapshots").children
    assert(snapsN.length <= 3, s"snapshots unbounded: ${snapsN.length}")
    snapsN.foreach { s =>
      val JString(ml) = (s \ "manifest-list"): @unchecked
      assert(fs.exists(new Path(ml)), s"dangling manifest-list $ml")
    }
    assert(snapsN.map(s => s \ "snapshot-id").contains(metaN \ "current-snapshot-id"))
    val maxId = ((metaN \ "schemas")(0) \ "fields").children
      .map(f => (f \ "id").asInstanceOf[JInt].num.toInt).max
    val JInt(lastCol) = (metaN \ "last-column-id"): @unchecked
    assert(lastCol.toInt >= maxId, s"last-column-id $lastCol < max field id $maxId")
    assert(!fs.exists(new Path(metaDir, "v1.metadata.json")), "old metadata not pruned")
  }

  test("corrupt version hint self-heals via the metadata scan (r13 review)") {
    val cat = new GraftCatalog(spark, tmpDir("ice_cat_hint"))
    writeRows(cat, 6)
    val r1 = IcebergExport.reconcile(cat, "default", "ice_m")
    val conf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(s"${cat.root}/_iceberg/default/ice_m/metadata")
    val fs = metaDir.getFileSystem(conf)
    // simulate the crash window: hint left as garbage (pre-r13 this
    // bricked every later reconcile on .toInt)
    val out = fs.create(new Path(metaDir, "version-hint.text"), true)
    try out.write("garbage".getBytes("UTF-8")) finally out.close()
    writeRows(cat, 4, offset = 3600L * 1000000L * 200) // change the file set
    val r2 = IcebergExport.reconcile(cat, "default", "ice_m")
    assert(r2.version == r1.version + 1, s"${r2.version} vs ${r1.version}")
    // the flip restored a parsable hint
    val in = fs.open(new Path(metaDir, "version-hint.text"))
    val hint = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(hint.trim.toInt == r2.version)
    // and no tmp file left behind
    assert(!fs.exists(new Path(metaDir, ".version-hint.text.tmp")))
  }

  test("missing version hint (delete->rename window) self-heals via the metadata scan (r13 ADVICE)") {
    val cat = new GraftCatalog(spark, tmpDir("ice_cat_nohint"))
    writeRows(cat, 6)
    val r1 = IcebergExport.reconcile(cat, "default", "ice_m")
    val conf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(s"${cat.root}/_iceberg/default/ice_m/metadata")
    val fs = metaDir.getFileSystem(conf)
    // simulate a reader/reconciler landing between the flip's delete and
    // rename: the hint is absent but v1.metadata.json is published —
    // state must come from the scan, NOT be treated as a fresh table
    fs.delete(new Path(metaDir, "version-hint.text"), false)
    writeRows(cat, 4, offset = 3600L * 1000000L * 200)
    val r2 = IcebergExport.reconcile(cat, "default", "ice_m")
    assert(r2.version == r1.version + 1,
      s"missing hint restarted versioning: ${r2.version} vs ${r1.version}")
    val in = fs.open(new Path(metaDir, "version-hint.text"))
    val hint = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(hint.trim.toInt == r2.version)
  }
}
