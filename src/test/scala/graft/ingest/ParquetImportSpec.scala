package graft.ingest

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.functions._

/** Parquet bulk import (reference importParquet, import_inprocess.go:322)
  * + database lifecycle DDL (reference databases.go handleCreate/
  * handleDelete, isValidDatabaseName).
  */
class ParquetImportSpec extends SparkSpec {

  private val base = 1717200000000000L // 2024-06-01T00:00:00Z µs

  private def newCatalog() = new GraftCatalog(spark, tmpDir("graft_pq_cat"))

  test("external parquet re-partitions into engine hour layout") {
    import spark.implicits._
    val cat = newCatalog()
    val src = tmpDir("pq_in")
    // epoch-µs long time column spanning two hours
    Seq(
      (base + 5L, "a", 0.5),
      (base + 3600L * 1000000L + 5L, "b", 0.7),
      (base + 9L, "c", 0.9))
      .toDF("time", "host", "usage")
      .write.mode("overwrite").parquet(src)

    val n = CsvImport.parquet(cat, "default", "cpu", src)
    assert(n == 3)
    val cpu = cat.table("default", "cpu")
    assert(cpu.count() == 3)
    assert(cpu.schema("time").dataType.typeName == "timestamp")
    assert(cat.listHourPartitions("default", "cpu").length == 2)
    // µs preserved through normalization
    assert(cpu.agg(min(unix_micros(col("time")))).head().getLong(0) == base + 5L)
  }

  test("timeFormat forces the epoch unit past magnitude detection") {
    import spark.implicits._
    val cat = newCatalog()
    val src = tmpDir("pq_in_s")
    // epoch SECONDS — small magnitudes that auto-detection also maps to
    // seconds; the explicit override must agree and a custom time column
    // name must be renamed to `time`
    Seq((base / 1000000L, 1L), (base / 1000000L + 60L, 2L))
      .toDF("ts", "v")
      .write.mode("overwrite").parquet(src)
    val n = CsvImport.parquet(cat, "default", "evt", src,
      timeCol = "ts", timeFormat = Some("epoch_s"))
    assert(n == 2)
    val evt = cat.table("default", "evt")
    assert(!evt.columns.contains("ts"))
    assert(evt.agg(min(unix_micros(col("time")))).head().getLong(0) == base)

    // unsupported format string fails loudly
    intercept[IllegalArgumentException] {
      CsvImport.parquet(cat, "default", "evt2", src,
        timeCol = "ts", timeFormat = Some("epoch_weeks"))
    }
  }

  test("database create/delete follow the reference's rules") {
    val cat = newCatalog()
    cat.createDatabase("metrics-prod_1")
    assert(cat.listDatabases().contains("metrics-prod_1"))
    // double-create is an error
    intercept[IllegalArgumentException] { cat.createDatabase("metrics-prod_1") }
    // invalid names
    for (bad <- Seq("", "1abc", "_x", "a" * 65, "sp ace", "semi;colon"))
      intercept[IllegalArgumentException] { cat.createDatabase(bad) }
    // reserved names (case-insensitive)
    for (r <- Seq("system", "Internal", "_internal"))
      intercept[IllegalArgumentException] { cat.createDatabase(r) }

    // delete requires confirm, and reserved names never delete
    intercept[IllegalArgumentException] { cat.deleteDatabase("metrics-prod_1") }
    intercept[IllegalArgumentException] {
      cat.deleteDatabase("system", confirm = true)
    }
    cat.deleteDatabase("metrics-prod_1", confirm = true)
    assert(!cat.listDatabases().contains("metrics-prod_1"))
    // deleting a missing database is an error
    intercept[IllegalArgumentException] {
      cat.deleteDatabase("metrics-prod_1", confirm = true)
    }
  }
}
