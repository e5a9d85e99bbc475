package graft.jobs

import graft.catalog.GraftCatalog
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.DataFrame

/** Tiered storage — age-based migration of hour partitions from the hot
  * root to a cold root, with transparent query-time union (reference:
  * internal/tiering/ + the multi-tier scan, query.go:2836-2921).
  *
  * The move is a directory copy + delete through the Hadoop FileSystem
  * API, so hot=file:// cold=s3a:// works unchanged. Readers union both
  * roots (`tableMultiTier`), and because the layout is identical on both
  * tiers, partition pruning applies to each side.
  */
object Tiering {

  final case class Result(migrated: Seq[String], kept: Int)

  /** Migrate partitions older than `afterDays` from hot to cold. */
  def migrate(catalog: GraftCatalog, coldRoot: String, db: String, m: String,
      afterDays: Int,
      nowMicros: () => Long = () => System.currentTimeMillis() * 1000L): Result = {
    val cutoffHour = nowMicros() / 1000000L / 3600L - afterDays.toLong * 24L
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    val hotBase = catalog.tablePath(db, m)
    val parts = catalog.listHourPartitions(db, m)
    val (old, kept) = parts.partition(p =>
      Compaction.partitionHourEpoch(p).exists(_ < cutoffHour))
    old.foreach { src =>
      // compare scheme-free URI paths on both sides: listHourPartitions
      // returns fully-qualified paths (file:/…, s3a://…) and a raw
      // string stripPrefix against the unqualified base would silently
      // keep the scheme, nesting `file:/…` dirs under the cold root
      val rel = src.toUri.getPath
        .stripPrefix(new Path(hotBase).toUri.getPath).stripPrefix("/")
      val dst = new Path(s"$coldRoot/$db/$m/$rel")
      val srcFs = src.getFileSystem(conf)
      val dstFs = dst.getFileSystem(conf)
      dstFs.mkdirs(dst.getParent)
      FileUtil.copy(srcFs, src, dstFs, dst, false, true, conf)
      srcFs.delete(src, true)
    }
    Result(old.map(_.toString), kept.length)
  }

  /** One logical table over both tiers (union-by-name, both pruned). */
  def table(catalog: GraftCatalog, coldRoot: String, db: String, m: String): DataFrame = {
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    val hot = new Path(catalog.tablePath(db, m))
    val cold = new Path(s"$coldRoot/$db/$m")
    val roots = Seq(hot, cold).filter(p => p.getFileSystem(conf).exists(p))
    catalog.tableMultiTier(roots.map(_.toString))
  }
}
