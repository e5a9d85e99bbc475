package graft.operators

import graft.SparkSpec
import graft.catalog.{GraftCatalog, TableMeta}
import graft.ingest.HourPartitionedWriter
import org.apache.spark.sql.functions._

/** Z-order clustering: interleave correctness, and the end-to-end
  * property the feature exists for — after a z-ordered daily rewrite,
  * any contiguous run of rows covers a SMALL range of EVERY z-key
  * (row-group stats prune on all of them), where a single-key sort
  * clusters one dimension and leaves the others spanning their full
  * range in every row group.
  */
class ZOrderSpec extends SparkSpec {

  private val H = 3600L * 1000000L
  private val base = 1717200000000000L // 2024-06-01T00:00:00Z µs

  test("zvalue interleaves bits in Morton order") {
    import spark.implicits._
    // 2 dims, ranges [0, 2^16) so quantization is identity on small ints:
    // z(x=0,y=0)=0 < z(1,0)=1 < z(0,1)=2 < z(1,1)=3 < z(2,0)=4 …
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3))
      .toDF("x", "y")
    val mx = (1 << 16) - 1
    val z = df.select(col("x"), col("y"),
        ZOrder.zvalue(Seq((col("x"), 0.0, mx.toDouble), (col("y"), 0.0, mx.toDouble)))
          .as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(z((0, 0)) == 0L && z((1, 0)) == 1L && z((0, 1)) == 2L &&
      z((1, 1)) == 3L && z((2, 0)) == 4L && z((0, 2)) == 8L &&
      z((3, 3)) == 15L, z.toString)
  }

  test("daily rewrite with zorderKeys clusters every dimension; plain sort does not") {
    import spark.implicits._
    // one day of data over an independent 64×64 grid in (a, b) — under a
    // sort by a alone, any contiguous quarter of the file spans ALL of b
    val n = 4096
    def rows = (0 until n).map { i =>
      // exact 64×64 grid, each cell once: a = low digits, b = a permuted
      // walk of the high digits — independent uniform dims
      val aDim = i % 64
      val bDim = ((i / 64) * 37 + 11) % 64
      (base + (i % 24) * H + i, aDim.toDouble, bDim.toDouble)
    }
    def mkCatalog(zorder: Boolean): GraftCatalog = {
      val cat = new GraftCatalog(spark, tmpDir("zorder_cat"))
      cat.writeMeta("default", "m", TableMeta(sortKeys = Seq("a"),
        zorderKeys = if (zorder) Seq("a", "b") else Nil))
      val df = rows.toDF("us", "a", "b")
        .select(timestamp_micros(col("us")).as("time"), col("a"), col("b"))
      HourPartitionedWriter.write(cat, "default", "m", df)
      cat
    }
    def listParquet(cat: GraftCatalog, dir: String): Seq[org.apache.hadoop.fs.Path] = {
      val fs = new org.apache.hadoop.fs.Path(cat.root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f.getPath
      }
      buf.toSeq
    }
    def compactAndReadSpans(cat: GraftCatalog): Seq[(Double, Double)] = {
      val dayDir = cat.listDayPartitions("default", "m").head
      val r = graft.jobs.Compaction.compactDay(cat, "default", "m", dayDir)
      assert(r.compacted && r.rowsOut == n, r.toString)
      val file = listParquet(cat, cat.dailyPath("default", "m")).last.toString
      // single file read by one task preserves row order; quarter spans
      val vals = spark.read.parquet(file).select("a", "b").collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      vals.grouped(n / 4).map { q =>
        val aSpan = q.map(_._1).max - q.map(_._1).min
        val bSpan = q.map(_._2).max - q.map(_._2).min
        (aSpan, bSpan)
      }.toSeq
    }

    val zCat = mkCatalog(zorder = true)
    val sCat = mkCatalog(zorder = false)

    // timestamp columns must be range-readable from footers too: the
    // engine forces TIMESTAMP_MICROS output (INT96, Spark's legacy
    // default, carries no usable stats and would silently disable
    // timestamp z-keys)
    val conf = spark.sparkContext.hadoopConfiguration
    val tr = graft.jobs.Compaction.footerColumnRange(conf,
      listParquet(sCat, sCat.tablePath("default", "m")), "time")
    assert(tr.isDefined, "time column has no footer stats (INT96 write?)")
    assert(tr.get._1 >= base.toDouble && tr.get._2 < base.toDouble + 25 * H,
      s"time range not in micros: $tr")

    val zSpans = compactAndReadSpans(zCat)
    val sSpans = compactAndReadSpans(sCat)
    // z-order: every quarter covers about one z-quadrant — BOTH dims
    // bounded well under the full 63-wide range
    zSpans.foreach { case (a, b) =>
      assert(a <= 40 && b <= 40, s"z-order quarter spans too wide: $zSpans")
    }
    // plain sort by a: a clusters, but some quarter spans (nearly) all of b
    assert(sSpans.exists(_._2 > 55),
      s"expected full-range b span under plain sort: $sSpans")
  }
}
