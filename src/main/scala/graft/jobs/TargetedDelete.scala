package graft.jobs

import graft.catalog.GraftCatalog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Targeted DELETE (DML) — remove rows matching a predicate by
  * rewriting only the files that contain matches, leaving all other
  * files untouched (reference: internal/api/delete.go:502-880 — find
  * affected files, count matches per file, rewrite without matches).
  *
  * Scale: the match-count pass is one distributed scan with partition
  * pruning (a time predicate prunes to the touched hours); rewrites are
  * per-file and embarrassingly parallel.
  */
object TargetedDelete {

  /** Per-file match census from the find-affected pass (the reference's
    * `affectedFile` rows, delete.go:131-135). */
  final case class FileMatches(path: String, matches: Long, rows: Long)

  final case class Preview(files: Seq[FileMatches]) {
    def affected: Seq[FileMatches] = files.filter(_.matches > 0)
    def totalMatches: Long = files.map(_.matches).sum
    def totalRows: Long = files.map(_.rows).sum
  }

  final case class Result(filesScanned: Long, filesRewritten: Long,
      rowsDeleted: Long, rowsKept: Long, filesProcessed: Seq[String] = Nil)

  /** The find-affected-files pass alone: one distributed scan counting
    * matches per source file — the dry-run surface (delete.go's
    * DryRun=true stops here). */
  def preview(catalog: GraftCatalog, db: String, m: String,
      predicate: Column): Preview = {
    val tbl = catalog.table(db, m).withColumn("_src", input_file_name())
    Preview(tbl.groupBy(col("_src"))
      .agg(sum(when(predicate, 1L).otherwise(0L)).as("n_match"),
        count(lit(1)).as("n_rows"))
      .collect()
      .map(r => FileMatches(r.getAs[String]("_src"),
        r.getAs[Long]("n_match"), r.getAs[Long]("n_rows")))
      .toSeq)
  }

  def apply(catalog: GraftCatalog, db: String, m: String,
      predicate: Column, maxRows: Long = Long.MaxValue): Result = {
    val spark = catalog.spark
    val conf = spark.sparkContext.hadoopConfiguration

    val pre = preview(catalog, db, m, predicate)
    val affected = pre.affected
    if (pre.totalMatches > maxRows)
      throw new IllegalStateException(
        s"delete would remove ${pre.totalMatches} rows > cap $maxRows")

    // per-file rewrites are independent (distinct target files, distinct
    // tmp dirs): run them from a bounded pool — a wide delete touching
    // hundreds of files pays one overlapped job latency, not the sum
    val deleted = BoundedParallel.run(affected) { fm =>
      val p = new Path(new java.net.URI(fm.path))
      val fs = p.getFileSystem(conf)
      if (fm.matches == fm.rows) {
        fs.delete(p, false) // whole file matches: drop it, no rewrite
      } else {
        val tmp = new Path(p.getParent, s"_delete_tmp_${p.getName}")
        fs.delete(tmp, true)
        spark.read.parquet(p.toString)
          .where(!coalesce(predicate, lit(false)))
          .coalesce(1)
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(tmp.toString)
        val rewritten = fs.listStatus(tmp)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        fs.delete(p, false)
        if (!fs.rename(rewritten.head.getPath, p))
          throw new java.io.IOException(
            s"delete-rewrite rename failed: ${rewritten.head.getPath} -> $p " +
              s"(rewritten rows preserved in $tmp)")
        fs.delete(tmp, true)
      }
      fm.matches
    }.sum
    Result(pre.files.length,
      affected.count(f => f.matches < f.rows),
      deleted, pre.totalRows - deleted,
      affected.map(_.path))
  }
}
