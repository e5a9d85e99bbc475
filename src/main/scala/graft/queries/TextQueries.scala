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
          bpeTokenCount(col("text")).as("n_bpe"),
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
        .orderBy(col("doc_id"))),

    // TF-IDF (ratio idf variant — log-free so both engines compute the
    // identical double): most characteristic term per document.
    // TF is computed LOCALLY per row (native term_counts kernel) — the
    // classic explode→groupBy(doc,term) plan shuffles every token
    // occurrence to count within a document, but a document's counts
    // need no other row. The exploded (doc, term, cnt) stream is already
    // distinct per (doc, term), so document frequency is a window count
    // per term. Two data shuffles total (df by term, top-1 by doc)
    // instead of four.
    "q68_text_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"),
          tokenCount(col("text")).as("n_tok"))
      // corpus size stays IN the plan (broadcast 1-row agg) — a driver-side
      // docs.count() here would force a second full scan of documents.
      val nDocs = broadcast(t(s, dir, "documents")
        .agg(count(lit(1)).cast("double").as("n_docs")))
      val tf = docs.select(col("doc_id"), col("n_tok"),
          explode(call_function("term_counts", col("toks"))).as("tc"))
        .select(col("doc_id"), col("n_tok"),
          col("tc.term").as("term"), col("tc.cnt").as("cnt"))
      val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.withColumn("df_t", count(lit(1)).over(wTerm))
        .crossJoin(nDocs)
        .withColumn("score", round(
          col("cnt").cast("double") / col("n_tok") * col("n_docs") / col("df_t"), 6))
        .withColumn("rn", row_number().over(wDoc))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("score"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q60_text_tokens" ->
      s"""SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |  len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
         |  ${bpeTokenCountSql("text")} AS n_bpe,
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
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q68_text_tfidf" ->
      s"""WITH d AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS toks,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_tok
         |  FROM documents),
         |terms AS (SELECT doc_id, n_tok, unnest(toks) AS term FROM d),
         |tf AS (SELECT doc_id, n_tok, term, COUNT(*) AS cnt
         |       FROM terms GROUP BY doc_id, n_tok, term),
         |dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, term,
         |  round(CAST(cnt AS DOUBLE) / n_tok * CAST(n_docs AS DOUBLE) / df_t, 6) AS score
         |FROM tf JOIN dfreq USING (term) CROSS JOIN n
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) = 1
         |ORDER BY doc_id""".stripMargin
  )
}
