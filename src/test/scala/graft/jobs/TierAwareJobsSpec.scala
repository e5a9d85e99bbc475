package graft.jobs

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.ingest.{ColumnarBatch, HourPartitionedWriter, LineProtocol}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The `__daily` tier must be visible to EVERY job that inventories a
  * table's files — after default daily compaction essentially all data
  * older than a day lives there, so a tier-blind backup/export/tiering
  * pass silently loses the historical majority of the table (round-11
  * review findings). Plus the targeted-delete crash-safe swap.
  */
class TierAwareJobsSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z µs

  private def lpIngest(cat: GraftCatalog, lines: String): Unit = {
    val (pts, errs) = LineProtocol.parse(lines, "us")
    assert(errs.isEmpty, errs.mkString(";"))
    ColumnarBatch.fromPoints(pts).foreach(HourPartitionedWriter.ingest(cat, "default", _))
  }

  private def hadoopFs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** day 1: 3 hourly rows (then day-compacted); day 2: 1 hourly row. */
  private def mixedTierTable(cat: GraftCatalog): Unit = {
    (0 until 3).foreach { h =>
      lpIngest(cat, s"m,host=h$h v=$h.0 ${base + h * H + 5}")
    }
    lpIngest(cat, s"m,host=x v=9.0 ${base + 24 * H + 5}")
    val dayDir = cat.listDayPartitions("default", "m").head
    val res = Compaction.compactDay(cat, "default", "m", dayDir)
    assert(res.compacted && res.rowsOut == 3, res)
    assert(cat.listDailyTierDays("default", "m").length == 1)
    assert(cat.listHourPartitions("default", "m").length == 1)
  }

  test("backup inventories the daily tier and the meta sidecar") {
    val cat = new GraftCatalog(spark, tmpDir("tier_bk_src"))
    mixedTierTable(cat)
    // arm a non-default meta so the restored sidecar is distinguishable
    val meta0 = cat.readMeta("default", "m")
    cat.writeMeta("default", "m", meta0.copy(dedupTime = true,
      tagColumns = Seq("host")))

    val bkRoot = tmpDir("tier_bk_dst")
    val r = Backup.create(cat, bkRoot, backupId = "b1")
    assert(r.files >= 3, r) // 1 daily + 1 hourly + 1 sidecar at least

    val fresh = new GraftCatalog(spark, tmpDir("tier_bk_restore"))
    Backup.restore(fresh, bkRoot, "b1")
    // ALL four rows restore — 3 of them live only in the __daily tier
    assert(fresh.table("default", "m").count() == 4,
      "day-compacted rows must survive a backup/restore")
    val meta = fresh.readMeta("default", "m")
    assert(meta.dedupTime && meta.tagColumns == Seq("host"),
      s"meta sidecar must ride along, got $meta")
  }

  test("backup skips part files inside in-flight staging dirs") {
    val cat = new GraftCatalog(spark, tmpDir("tier_bk_tmp"))
    lpIngest(cat, s"m,host=a v=1.0 ${base + 5}")
    // plant a transient staging tree with a parquet inside
    val hourDir = cat.listHourPartitions("default", "m").head
    val fs = hadoopFs(hourDir)
    val staged = new Path(hourDir, "_delete_tmp_x/part-0.parquet")
    fs.mkdirs(staged.getParent)
    val out = fs.create(staged); out.write(1); out.close()

    val bkRoot = tmpDir("tier_bk_tmp_dst")
    Backup.create(cat, bkRoot, backupId = "b1")
    val copied = hadoopFs(new Path(bkRoot))
      .listFiles(new Path(bkRoot), true)
    var sawStaged = false
    while (copied.hasNext) {
      val f = copied.next()
      if (f.getPath.toString.contains("_delete_tmp_")) sawStaged = true
    }
    assert(!sawStaged, "staging part files must not be backed up")
  }

  test("iceberg reconcile snapshots both tiers") {
    val cat = new GraftCatalog(spark, tmpDir("tier_ice"))
    mixedTierTable(cat)
    val r = IcebergExport.reconcile(cat, "default", "m")
    assert(r.files == 2, s"1 daily + 1 hourly file, got ${r.files}")
    assert(r.rows == 4,
      s"snapshot must cover the day-compacted rows, got ${r.rows}")
  }

  test("tiering migrates daily-tier days, prunes hollow parents, unions all four roots") {
    val cat = new GraftCatalog(spark, tmpDir("tier_mig_hot"))
    val cold = tmpDir("tier_mig_cold")
    mixedTierTable(cat)
    // afterDays=7 at now = base+10d: day-1 data (daily tier) is old,
    // day-2 hourly data is old too; re-ingest a fresh hourly row so one
    // stays hot
    val now = base + 10L * 24 * H
    lpIngest(cat, s"m,host=fresh v=5.0 ${now - H + 5}")
    val res = Tiering.migrate(cat, cold, "default", "m", afterDays = 7,
      nowMicros = () => now)
    // migrated: 1 hour partition (day 2) + 1 daily-tier day (day 1)
    assert(res.migrated.length == 2 && res.kept == 1, res)
    assert(res.migrated.exists(_.contains(GraftCatalog.DailySuffix)),
      "the daily tier day must migrate too")
    // hot hourly tree has no hollow year= chain left behind
    val hotDaily = new Path(cat.dailyPath("default", "m"))
    val fs = hadoopFs(hotDaily)
    assert(!fs.exists(new Path(hotDaily, "year=2024")) ||
      fs.listStatus(new Path(hotDaily, "year=2024")).nonEmpty,
      "migration must not leave hollow partition dirs")
    // union read sees every row across all four roots
    val all = Tiering.table(cat, cold, "default", "m")
    assert(all.count() == 5)
    assert(all.select("v").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(0.0, 1.0, 2.0, 5.0, 9.0))
  }

  test("targeted delete resolves partition-column predicates") {
    val cat = new GraftCatalog(spark, tmpDir("tier_del_part"))
    lpIngest(cat,
      s"""m,host=a v=1.0 ${base + 5}
         |m,host=a v=2.0 ${base + H + 5}
         |m,host=b v=3.0 ${base + H + 6}""".stripMargin)
    // hour is a PARTITION column of the hourly tree — preview resolves
    // it via catalog.table, and the per-file rewrite must too
    val res = TargetedDelete(cat, "default", "m",
      col("hour") === 1 && col("host") === "a")
    assert(res.rowsDeleted == 1 && res.rowsKept == 2, res)
    assert(cat.table("default", "m").select("v")
      .collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 3.0))
    // rewrite did not bake path columns into the file as data columns
    val hourDir = cat.listHourPartitions("default", "m")
      .find(_.toString.contains("hour=1")).get
    val file = hadoopFs(hourDir).listStatus(hourDir)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val cols = spark.read.parquet(file.toString).columns.toSet
    assert(!cols.exists(Set("year", "month", "day", "hour")),
      s"path columns leaked into the rewritten file: $cols")
  }

  test("targeted delete swap is journaled: recover() repairs both crash sides") {
    val cat = new GraftCatalog(spark, tmpDir("tier_del_crash"))
    lpIngest(cat,
      s"""m,host=a v=1.0 ${base + 5}
         |m,host=b v=2.0 ${base + 6}""".stripMargin)
    val tablePath = cat.tablePath("default", "m")
    val conf = spark.sparkContext.hadoopConfiguration
    val hourDir = cat.listHourPartitions("default", "m").head
    val fs = hadoopFs(hourDir)
    val orig = fs.listStatus(hourDir)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath

    // crash side 1 — BEFORE the rename: entry journaled, tmp written,
    // output missing. recover() must roll back; the original survives.
    val tmp = new Path(hourDir, s"_delete_tmp_${orig.getName}")
    spark.read.parquet(orig.toString).where(col("host") =!= "a")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val out1 = new Path(hourDir, "m_crash1.d1.parquet")
    CompactionManifest.begin(tablePath, conf, CompactionManifest.Entry(
      id = "delete:crash1", tier = "delete", partition = hourDir.toString,
      tmpDir = tmp.toString, inputs = Seq(orig.toString),
      outputs = Seq(out1.toString)))
    val acts1 = Compaction.recover(cat, "default", "m")
    assert(acts1.exists(_.startsWith("rolled_back")), acts1)
    assert(fs.exists(orig) && !fs.exists(out1) && !fs.exists(tmp))
    assert(cat.table("default", "m").count() == 2, "original rows intact")

    // crash side 2 — AFTER the rename, before deleting the original:
    // output present. recover() must finish the swap (delete original).
    spark.read.parquet(orig.toString).where(col("host") =!= "a")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val out2 = new Path(hourDir, "m_crash2.d2.parquet")
    CompactionManifest.begin(tablePath, conf, CompactionManifest.Entry(
      id = "delete:crash2", tier = "delete", partition = hourDir.toString,
      tmpDir = tmp.toString, inputs = Seq(orig.toString),
      outputs = Seq(out2.toString)))
    assert(fs.rename(part, out2))
    val acts2 = Compaction.recover(cat, "default", "m")
    assert(acts2.exists(_.startsWith("completed")), acts2)
    assert(!fs.exists(orig) && fs.exists(out2) && !fs.exists(tmp))
    assert(cat.table("default", "m").collect().map(_.getAs[String]("host"))
      .toSeq == Seq("b"), "swap completed exactly once")
  }

  test("repeated deletes of one file keep a bounded name and recency position") {
    val cat = new GraftCatalog(spark, tmpDir("tier_del_rep"))
    lpIngest(cat,
      s"""m,host=a v=1.0 ${base + 5}
         |m,host=b v=2.0 ${base + 6}
         |m,host=c v=3.0 ${base + 7}""".stripMargin)
    TargetedDelete(cat, "default", "m", col("host") === "a")
    TargetedDelete(cat, "default", "m", col("host") === "b")
    val hourDir = cat.listHourPartitions("default", "m").head
    val names = hadoopFs(hourDir).listStatus(hourDir)
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(names.length == 1, names.toSeq)
    // one .d<ts> marker, not a chain (.d1.d2...)
    assert(names.head.split("\\.d").length == 2, names.head)
    assert(cat.table("default", "m").count() == 1)
  }
}
