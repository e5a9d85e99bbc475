package graft.jobs

import graft.catalog.GraftCatalog

import java.util.concurrent.atomic.AtomicBoolean

/** Compaction scheduling (reference: internal/compaction/scheduler.go +
  * manager.go): a periodic tick that, per measurement, first replays the
  * in-flight manifest ([[Compaction.recover]]) and then runs the hourly
  * and daily tiers.
  *
  * The tick itself is deterministic and callable directly (tests and
  * external cron drive `tick()`); `start()` wraps it in a daemon-thread
  * interval loop for standalone deployments. With `db = None` the tick
  * covers EVERY database the catalog lists at that moment (the
  * reference's manager schedules all databases, manager.go) — new
  * databases are picked up on the next tick with no re-configuration.
  * On a cluster the natural deployment is one scheduler per driver,
  * with per-measurement work fanning out as independent Spark jobs —
  * partitions never contend, and the per-table manifest keeps
  * concurrent schedulers on *different* tables isolated; each table's
  * swap journal is its own file, so a multi-db tick adds no shared
  * state.
  */
final class CompactionScheduler(
    catalog: GraftCatalog,
    db: Option[String] = None,
    intervalMillis: Long = 5 * 60 * 1000L,
    hourlyMinFiles: Int = 2,
    hourlyMinAgeHours: Int = 1,
    dailyMinFiles: Int = 12,
    dailyMinAgeHours: Int = 24,
    skipFileAgeCheckDays: Int = 7,
    icebergExport: Boolean = false,
    nowMicros: () => Long = () => System.currentTimeMillis() * 1000L) {

  final case class TickReport(
      db: String,
      measurement: String,
      recovered: Seq[String],
      hourly: Seq[Compaction.Result],
      daily: Seq[Compaction.Result],
      iceberg: Option[IcebergExport.Result] = None)

  /** One scheduler pass over every measurement of every covered
    * database. Per-database failures are isolated: one broken table
    * (e.g. corrupt partition dir) must not starve the other databases
    * of compaction, mirroring the reference's per-job isolation. */
  def tick(): Seq[TickReport] = {
    val dbs = db.map(Seq(_)).getOrElse(catalog.listDatabases())
    dbs.flatMap { d =>
      try tickDb(d)
      catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"compaction tick failed for db '$d': ${e.getMessage}")
          Nil
      }
    }
  }

  private def tickDb(d: String): Seq[TickReport] =
    catalog.listTables(d).map { m =>
      val recovered = Compaction.recover(catalog, d, m)
      val hourly = Compaction.runHourly(catalog, d, m,
        minFiles = hourlyMinFiles, minAgeHours = hourlyMinAgeHours,
        nowMicros = nowMicros)
      val daily = Compaction.runDaily(catalog, d, m,
        minFiles = dailyMinFiles, minAgeHours = dailyMinAgeHours,
        skipFileAgeCheckDays = skipFileAgeCheckDays, nowMicros = nowMicros)
      // iceberg reconcile runs AFTER compaction so the snapshot sees the
      // post-merge file set (reference: iceberg/scheduler.go drives the
      // exporter off the same periodic loop); per-table failures stay
      // isolated like everything else in the tick
      val ice =
        if (!icebergExport) None
        else try Some(IcebergExport.reconcile(catalog, d, m))
        catch {
          case e: Exception =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"iceberg export failed for $d/$m: ${e.getMessage}")
            None
        }
      TickReport(d, m, recovered, hourly, daily, ice)
    }

  private val running = new AtomicBoolean(false)
  @volatile private var thread: Option[Thread] = None

  def start(): Unit = {
    if (!running.compareAndSet(false, true)) return
    val t = new Thread(() => {
      while (running.get()) {
        try tick()
        catch { case _: InterruptedException => () case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"compaction tick failed: ${e.getMessage}") }
        try Thread.sleep(intervalMillis)
        catch { case _: InterruptedException => () }
      }
    }, s"graft-compaction-scheduler-${db.getOrElse("all")}")
    t.setDaemon(true)
    thread = Some(t)
    t.start()
  }

  def stop(): Unit = {
    running.set(false)
    thread.foreach(_.interrupt())
    thread = None
  }
}
