package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Cluster-safe compute-once barrier for frames consumed more than once
  * (or rebuilt each round of an iterative loop).
  *
  * Every such site in the engine used `localCheckpoint()` directly until
  * round 13. That is the right call on a `local[*]` master — one JVM, so
  * "executor loss" and "driver loss" are the same event — but it is an
  * executor-LIFETIME bet everywhere else: localCheckpoint truncates
  * lineage AND stores the only copy of the blocks on the executors that
  * computed them, so on a real cluster a single lost executor (dynamic
  * deallocation, preemption, OOM kill) fails the job with no recompute
  * path. Worse, several call sites (ShardPack, BudgetSelect, GlobalRank)
  * rely on the barrier to PIN partition contents across two jobs — a
  * recompute that produced different row order would be silently wrong,
  * so plain `persist()` (recompute-tolerant but order-unstable on block
  * loss) is not a safe substitute there either.
  *
  * The one mechanism that gives both properties off-executor is a
  * reliable checkpoint: blocks written to fault-tolerant storage, lineage
  * truncated, contents immutable. So:
  *
  *  - `local[*]` master  → `localCheckpoint()` (status quo: fastest, and
  *    exactly as durable as the lone JVM it runs in);
  *  - anything else      → `checkpoint()` against the session checkpoint
  *    dir, defaulting `spark.graft.checkpoint.dir` → Spark's checkpoint
  *    dir → a tmp-dir fallback (fine for `local-cluster` single-machine
  *    testing; multi-node deployments MUST point
  *    `spark.graft.checkpoint.dir` at shared storage — HDFS/S3 — or
  *    executors cannot read each other's checkpoint files).
  *
  * `spark.graft.barrier.mode` = `local` | `reliable` | `auto` (default)
  * overrides the dispatch, e.g. to force the reliable path in a
  * single-JVM test (MaterializeSpec does) or localCheckpoint on a
  * cluster whose jobs prefer fail-and-retry over checkpoint I/O.
  *
  * Set `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
  * checkpoint files garbage-collected with their RDDs. That cleaner only
  * removes files whose RDDs were GC'd, so whatever is still referenced
  * at JVM exit would otherwise accumulate in java.io.tmpdir across runs
  * — when the TMP FALLBACK dir is chosen (no configured checkpoint dir),
  * [[Materialize]] registers a shutdown hook that deletes the
  * app-id-scoped directory on exit. A user-configured
  * `spark.graft.checkpoint.dir` is durable shared storage and is never
  * auto-deleted.
  */
object Materialize {

  /** True when barriers in this session take the reliable-checkpoint
    * path (non-local master, or forced via spark.graft.barrier.mode). */
  def isReliable(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.barrier.mode", "auto") match {
      case "local"    => false
      case "reliable" => true
      case _          => !spark.sparkContext.isLocal
    }

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    if (!isReliable(spark)) ds.localCheckpoint()
    else {
      ensureCheckpointDir(spark)
      ds.checkpoint()
    }
  }

  /** Idempotently give the context a checkpoint dir. Synchronized:
    * concurrent queries in one session would otherwise race the
    * get/set pair (last writer wins either way — both dirs are valid —
    * but the lock keeps the artifact layout single-rooted). */
  private def ensureCheckpointDir(spark: SparkSession): Unit = synchronized {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val configured = spark.conf.getOption("spark.graft.checkpoint.dir")
      val dir = configured.getOrElse(sys.props("java.io.tmpdir") +
        "/graft-ckpt-" + sc.applicationId)
      sc.setCheckpointDir(dir)
      if (configured.isEmpty) registerTmpCleanup(dir)
    }
  }

  private val cleanupDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Dirs whose shutdown-hook deletion is registered (spec hook). */
  private[graft] def registeredTmpCleanups: Set[String] = {
    import scala.jdk.CollectionConverters._
    cleanupDirs.asScala.toSet
  }

  /** Delete the tmp-fallback checkpoint root on JVM exit. Idempotent
    * per dir (a second session reusing the same app-id-scoped path
    * registers no second hook). */
  private[graft] def registerTmpCleanup(dir: String): Unit =
    if (cleanupDirs.add(dir))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteRecursively(new java.io.File(dir)),
          s"graft-ckpt-cleanup"))

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  implicit class MaterializeOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Compute-once barrier; see [[Materialize]] for the dispatch. */
    def materialize(): Dataset[T] = Materialize(ds)
  }
}
