package graft.jobs

import graft.catalog.GraftCatalog
import org.apache.hadoop.fs.Path

/** Retention policy — scheduled deletion of partitions whose event-time
  * hour is older than `retentionDays` (+ a safety buffer), per
  * db/measurement. Pure path arithmetic, no data scan — the Spark
  * mirror of the reference's retention scheduler
  * (internal/api/retention.go:54-67, :407).
  */
object Retention {

  final case class Result(deleted: Seq[String], keptCount: Int)

  def apply(catalog: GraftCatalog, db: String, m: String,
      retentionDays: Int, bufferDays: Int = 0,
      nowMicros: () => Long = () => System.currentTimeMillis() * 1000L)
      : Result = {
    val cutoffHour =
      nowMicros() / 1000000L / 3600L - (retentionDays + bufferDays).toLong * 24L
    val parts = catalog.listHourPartitions(db, m)
    val (old, kept) = parts.partition(p =>
      Compaction.partitionHourEpoch(p).exists(_ < cutoffHour))
    // day-compacted tier: a day expires when its LAST hour is expired
    val (oldDays, keptDays) = catalog.listDailyTierDays(db, m).partition(p =>
      Compaction.partitionDayValues(p).exists { case (y, mo, d) =>
        java.time.LocalDate.of(y, mo, d).atStartOfDay
          .toEpochSecond(java.time.ZoneOffset.UTC) / 3600L + 23 < cutoffHour
      })
    val conf = catalog.spark.sparkContext.hadoopConfiguration
    (old ++ oldDays).foreach { p =>
      val fs = p.getFileSystem(conf)
      fs.delete(p, true)
      // prune now-empty day/month/year parents
      var parent = p.getParent
      while (parent != null && parent.getName.contains("=") &&
        fs.exists(parent) && fs.listStatus(parent).isEmpty) {
        fs.delete(parent, false)
        parent = parent.getParent
      }
    }
    Result((old ++ oldDays).map(_.toString), kept.length + keptDays.length)
  }
}
