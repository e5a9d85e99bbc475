package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, content fingerprinting,
  * shingling, MinHash signatures and SimHash — all composed from
  * codegen'd built-ins (no UDFs), so they stay inside whole-stage
  * codegen and scale linearly per row with no driver involvement.
  *
  * Every function has an exactly-equivalent DuckDB SQL spelling (used by
  * the oracle generators in graft.queries) built on the same integer
  * arithmetic, so results are bit-exact across engines.
  */
object TextFunctions {

  val Prime: Long = 1000000007L

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Consecutive-duplicate collapse over a token array (q98 / pipeline
    * normalization stage). The i=1 branch is a separate WHEN arm so
    * toks[i-1] is never evaluated at i=1 (CaseWhen guarantees sequential
    * condition evaluation). Pass a BOUND column, not a raw tokenizer
    * expression — per-index element_at re-evaluates its child per
    * element inside generators. */
  def collapseConsecutive(toks: Column): Column = filter(
    transform(sequence(lit(1), size(toks)),
      i => when(i === 1, element_at(toks, i))
        .when(element_at(toks, i) =!= element_at(toks, i - 1),
          element_at(toks, i))),
    x => x.isNotNull)

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish pretokenizer count (GPT-2-family pattern, lookahead-free so
    * Java regex and RE2 agree): contractions, space-prefixed letter runs,
    * number runs, punctuation runs. The "how many model tokens is this
    * corpus" estimator — whitespace counting under-counts punctuation-
    * heavy text. Both engines use leftmost-first alternation, so counts
    * are identical. */
  val BpeTokenPattern = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}\\p{N}]+| ?[^\\p{L}\\p{N}\\s]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  def bpeTokenCountSql(col: String): String =
    s"len(regexp_extract_all($col, '${BpeTokenPattern.replace("'", "''")}'))"

  /** Polynomial rolling hash over characters: fold (acc*31 + ascii(c)) % P.
    * The document-fingerprint primitive; also the base hash for MinHash
    * shingles (deterministic, engine-independent — unlike murmur/xxhash
    * whose seeds differ between engines). Evaluated by the native
    * PolyHash expression (codegen'd tight loop; the composed
    * aggregate/split form costs a closure call per character). */
  def charFingerprint(text: Column): Column = call_function("poly_hash", text)

  /** Compression-ratio quality signal (see [[DeflateRatio]]): low =
    * repetitive/boilerplate, ~1 = incompressible junk. No SQL oracle
    * (DuckDB has no deflate) — property-specced instead. */
  def compressionRatio(text: Column): Column = call_function("deflate_ratio", text)

  /** Same rolling hash, spelled for DuckDB. */
  def charFingerprintSql(col: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($col, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $Prime)"

  private val stopwords = Seq("the", "a", "of", "and", "or", "is", "in", "to")
  /** The list itself, for composed rule batteries (q156). */
  def stopwordSeq: Seq[String] = stopwords
  def stopwordsSqlList: String = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*)))

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Composite quality score in [0,1]: length saturation, non-stopword
    * density, token diversity. Pure ratios of integer counts — exact
    * across engines before the final double ops. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nStop = stopwordCount(text).cast("double")
    val nDist = distinctTokenCount(text).cast("double")
    round(
      least(nTok / 50.0, lit(1.0)) * 0.4 +
        (lit(1.0) - nStop / nTok) * 0.3 +
        (nDist / nTok) * 0.3, 6)
  }

  def qualityScoreSql(col: String): String = {
    val nTok = s"CAST(len(string_split_regex(trim($col), '\\s+')) AS DOUBLE)"
    val nStop = s"CAST(len(list_filter(string_split_regex(trim($col), '\\s+'), " +
      s"t -> list_contains($stopwordsSqlList, t))) AS DOUBLE)"
    val nDist = s"CAST(len(list_distinct(string_split_regex(trim($col), '\\s+'))) AS DOUBLE)"
    s"round(least($nTok / 50.0, 1.0) * 0.4 + (1.0 - $nStop / $nTok) * 0.3 + " +
      s"($nDist / $nTok) * 0.3, 6)"
  }

  /** Language markers: tiny per-language stopword profiles. On real corpora
    * these would be char-n-gram profiles; the marker-count argmax shape is
    * the same and is exactly SQL-expressible for the oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "des"),
    "zh" -> Seq("de", "shi", "bu"))

  /** argmax over language marker counts, first-listed language wins
    * ties. Pass a BOUND token column where possible: the argmax
    * references every per-language count twice (value + tie compare),
    * so an inline tokenizer expression re-evaluates per reference
    * (measured 1.8× slower on q62). */
  def langIdFromTokens(toks: Column): Column = {
    val counts = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms.map(x => x: Any): _*)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(c === best && best > 0, lang).otherwise(acc)
    }
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  def langIdSql(col: String): String = {
    val toks = s"string_split_regex(trim($col), '\\s+')"
    def cnt(ms: Seq[String]) =
      s"len(list_filter($toks, t -> list_contains(${ms.map(m => s"'$m'").mkString("[", ", ", "]")}, t)))"
    val counts = langMarkers.map { case (lang, ms) => lang -> cnt(ms) }
    val best = counts.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    counts.foldRight("'und'") { case ((lang, c), acc) =>
      s"CASE WHEN $c = best_cnt AND best_cnt > 0 THEN '$lang' ELSE $acc END"
    } match {
      case caseExpr => s"(SELECT $caseExpr FROM (SELECT $best AS best_cnt))"
    }
  }

  /** k-token shingles as strings (1-indexed slices, same in DuckDB). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  def shinglesSql(col: String, k: Int): String = {
    val toks = s"string_split_regex(trim($col), '\\s+')"
    s"list_distinct(list_transform(generate_series(1, greatest(len($toks) - ${k - 1}, 1)), " +
      s"i -> array_to_string(list_slice($toks, i, i + ${k - 1}), ' ')))"
  }

  /** Shingle hash set: polynomial char hash of each shingle. */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(shingles(text, k), s => hashOfString(s)))

  private def hashOfString(s: Column): Column = call_function("poly_hash", s)

  /** Public polynomial hash of a single token/string value. */
  def tokenHash(t: Column): Column = hashOfString(t)

  def tokenHashSql(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(" +
      s"string_split($v, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $Prime)"

  def shingleHashesSql(col: String, k: Int): String =
    s"list_distinct(list_transform(${shinglesSql(col, k)}, s -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $Prime)))"

  /** Deterministic MinHash family: h_i(x) = (a_i * x + b_i) % P with fixed
    * odd multipliers. a_i*x < 2^63 since x < P ~ 1e9 and a_i < 4e3. */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map(i => (2L * i + 3L, 1L + i * i))

  /** MinHash signature: array of numHashes minima over the shingle set
    * (native MinHashArray expression — one tight loop per row). */
  def minhashSignature(shingleHashesCol: Column, numHashes: Int): Column =
    call_function("minhash_array", shingleHashesCol, lit(numHashes))

  def minhashSignatureSql(hashesExpr: String, numHashes: Int): String =
    minhashParams(numHashes).map { case (a, b) =>
      s"list_min(list_transform($hashesExpr, h -> (h * $a + $b) % $Prime))"
    }.mkString("[", ", ", "]")

  val SimHashBits = 32


  /** 32-bit SimHash over the token multiset: per bit, sum +1/-1 by that
    * bit of each token's polynomial hash; bit set iff the sum > 0.
    * Native SimHashBits expression over per-token PolyHash values. */
  def simhash(text: Column): Column =
    call_function("simhash_bits", transform(tokens(text), t => hashOfString(t)))

  def simhashSql(col: String): String = {
    val toks = s"string_split_regex(trim($col), '\\s+')"
    val tokHashes = s"list_transform($toks, t -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $Prime))"
    s"""(SELECT list_sum(list_transform(generate_series(0, ${SimHashBits - 1}), b ->
       |   CASE WHEN list_sum(list_transform(th, h -> ((h >> b) & 1) * 2 - 1)) > 0
       |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
       | FROM (SELECT $tokHashes AS th))""".stripMargin
  }
}
