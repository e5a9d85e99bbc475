package graft.ingest

import graft.SparkSpec
import graft.catalog.{GraftCatalog, TableMeta}
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Tag columns get parquet bloom filters in every write path (Spark
  * writer flush, compaction rewrite, direct RecordConsumer flush):
  * point predicates on tags are the dominant selective filter at scan
  * time, and tags interleave within a file, so row-group min/max never
  * prunes them — the bloom filter lets the reader skip row groups.
  * Non-tag columns must NOT pay the space.
  *
  * parquet-mr only MATERIALIZES a bloom filter when the chunk is not
  * fully dictionary-encoded (a complete dictionary already filters
  * exactly) — precisely the high-cardinality regime where tag lookups
  * need it at 100 TB. The fixtures therefore use tags wide/distinct
  * enough to overflow the 1 MB dictionary page and force the fallback.
  */
class BloomFilterSpec extends SparkSpec {

  private val base = 1717200000000000L
  private val N = 60000

  // unique ~28-byte tags: 60k of them ≈ 1.7 MB > the dict page budget
  private def tag(i: Int) = f"host_$i%07d_abcdefghijklmnop"

  private def bloomOffsets(file: Path): Map[String, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      r.getFooter.getBlocks.asScala.head.getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
    } finally r.close()
  }

  private def parquetFiles(cat: GraftCatalog, db: String, m: String): Seq[Path] = {
    val fs = new Path(cat.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(cat.tablePath(db, m)), true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f.getPath
    }
    buf.toSeq
  }

  test("flush writes bloom filters for tag columns only; compaction preserves them") {
    import spark.implicits._
    val cat = new GraftCatalog(spark, tmpDir("bloom_cat"))
    cat.writeMeta("default", "m", TableMeta(tagColumns = Seq("host")))
    def batch(offset: Long) = (0 until N).map(i =>
      (base + offset + (i % 3000) * 1000000L, tag(i), i * 1.5))
      .toDF("us", "host", "v")
      .select(timestamp_micros(col("us")).as("time"), col("host"), col("v"))
    HourPartitionedWriter.write(cat, "default", "m", batch(0))

    val flushed = parquetFiles(cat, "default", "m")
    assert(flushed.nonEmpty)
    flushed.foreach { f =>
      val off = bloomOffsets(f)
      assert(off("host") >= 0, s"no bloom filter on tag column host in $f: $off")
      assert(off("v") < 0, s"unexpected bloom filter on value column v in $f: $off")
    }

    // second flush into the same hours, then compaction: the rewritten
    // file must carry the tag bloom filter too
    HourPartitionedWriter.write(cat, "default", "m", batch(1))
    val hourDirs = flushed.map(_.getParent).distinct
    hourDirs.foreach(d => graft.jobs.Compaction.compactHour(cat, "default", "m", d))
    val compacted = parquetFiles(cat, "default", "m")
    assert(compacted.nonEmpty)
    compacted.foreach { f =>
      val off = bloomOffsets(f)
      assert(off("host") >= 0, s"compaction dropped the bloom filter in $f: $off")
      assert(off("v") < 0)
    }
  }

  test("direct parquet flush writes bloom filters for tag columns") {
    val cat = new GraftCatalog(spark, tmpDir("bloom_direct"))
    val cols = scala.collection.mutable.LinkedHashMap[String, Array[Any]](
      "time" -> Array.tabulate(N)(i => (base + (i % 3000) * 1000000L): Any),
      "host" -> Array.tabulate(N)(i => tag(i): Any),
      "v" -> Array.tabulate(N)(i => (i * 2.0): Any))
    val batch = ColumnarBatch("m", cols, tagColumns = Seq("host"))
    val files = DirectParquetWriter.write(cat, "default", batch)
    assert(files.nonEmpty)
    files.foreach { f =>
      val off = bloomOffsets(new Path(f))
      assert(off("host") >= 0, s"no bloom filter on host in $f: $off")
      assert(off("v") < 0)
    }
  }
}
