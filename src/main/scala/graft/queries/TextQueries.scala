package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Training-data text analysis over the `documents` table: token
  * statistics, quality scoring, language-ID, content fingerprinting.
  * All per-row compute composed from codegen'd built-ins — scales
  * linearly, no shuffle except the final aggregations.
  */
object TextQueries {

  val queries: Map[String, Q] = Map(
    // token statistics per document
    "q60_text_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          distinctTokenCount(col("text")).as("n_distinct"),
          length(col("text")).as("n_chars_txt"))
        .orderBy(col("doc_id"))),

    // quality scoring: saturating length + stopword density + diversity
    "q61_text_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          stopwordCount(col("text")).as("n_stop"),
          punctCount(col("text")).as("n_punct"),
          qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // language-ID (marker-profile argmax) vs the labeled lang column
    "q62_text_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))),

    // rolling-hash content fingerprint per document
    "q63_text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), charFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")))
  )

  val oracles: Map[String, String] = Map(
    "q60_text_tokens" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |  len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
         |  length(text) AS n_chars_txt
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q61_text_quality" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |  len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains($stopwordsSqlList, t))) AS n_stop,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  ${qualityScoreSql("text")} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q62_text_langid" ->
      s"""SELECT lang, ${langIdSql("text")} AS lang_pred, COUNT(*) AS n
         |FROM documents GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin,

    "q63_text_fingerprint" ->
      s"""SELECT doc_id, ${charFingerprintSql("text")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
