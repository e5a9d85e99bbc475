package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q81's masking on planted PII — the synthetic corpus carries none, so
  * the oracle run only proves regex parity; this proves the scrub. */
class ScrubSpec extends SparkSpec {

  test("emails and URLs are masked, counts match, clean text unchanged") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice.smith+dev@example.co.uk or bob@corp.io today"),
      (2L, "see https://example.com/a?b=1 and http://short.ly/x for docs"),
      (3L, "mixed bag@leak.org via https://t.co/abc123"),
      (4L, "perfectly clean text with no identifiers at all"),
      (5L, "SHOUTED LINK HTTPS://TRACKER.EXAMPLE.COM/UID=9 LEAKS TOO"),
      (6L, "unsubscribe https://x.com/opt?email=a@b.com thanks")
    ).toDF("doc_id", "text")
    val out = df
      .withColumn("_nourl", regexp_replace(col("text"), TextQueries.UrlRe, "<URL>"))
      .select(
        col("doc_id"),
        regexp_replace(col("_nourl"), TextQueries.EmailRe, "<EMAIL>").as("scrubbed"),
        size(regexp_extract_all(col("text"), lit(TextQueries.UrlRe), lit(0))).as("n_urls"),
        size(regexp_extract_all(col("_nourl"), lit(TextQueries.EmailRe), lit(0))).as("n_emails"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == (("contact <EMAIL> or <EMAIL> today", 0, 2)))
    assert(out(2L) == (("see <URL> and <URL> for docs", 2, 0)))
    assert(out(3L) == (("mixed <EMAIL> via <URL>", 1, 1)))
    assert(out(4L) == (("perfectly clean text with no identifiers at all", 0, 0)))
    // scheme matching is case-insensitive
    assert(out(5L) == (("SHOUTED LINK <URL> LEAKS TOO", 1, 0)))
    // an email inside a URL is covered by <URL>, not double-reported
    assert(out(6L) == (("unsubscribe <URL> thanks", 1, 0)))
  }
}
