package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFingerprint

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram-marker language ID, document fingerprinting.
  * All but the fingerprint are expressed in pure built-in column functions
  * (codegen'd, no UDFs) and mirrored in DuckDB oracles; counts use the
  * substring-replace trick so both engines compute identical integers.
  */
object TextQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Occurrences of `marker` in `c` via length difference. */
  private def occ(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) / marker.length).cast("long")

  /** Token counts per document. */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(toks(col("text")))).cast("long").as("n_distinct"))

  /** Quality scores: length, token stats, stopword ratio, char/token. */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val stop = occ(concat(lit(" "), col("text"), lit(" ")), " the ") +
      occ(concat(lit(" "), col("text"), lit(" ")), " a ")
    docs(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_actual"),
      nTok.as("n_tokens"),
      round(stop.cast("double") / nTok, 4).as("stopword_ratio"),
      round(length(col("text")).cast("double") / nTok, 4).as("chars_per_token"))
  }

  /** Marker-based language ID (n-gram heuristic): count language-specific
    * markers, argmax with a fixed priority order. The synthetic corpus is
    * English-ish so 'en' dominates; the operator shape is what matters. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val cEn = occ(padded, " the ") + occ(padded, " a ")
    val cDe = occ(padded, " der ") + occ(padded, " und ")
    val cEs = occ(padded, " el ") + occ(padded, " y ")
    val cFr = occ(padded, " le ") + occ(padded, " et ")
    val g = greatest(cEn, cDe, cEs, cFr)
    val pred = when(g === 0, "unk")
      .when(cEn === g, "en").when(cDe === g, "de")
      .when(cEs === g, "es").otherwise("fr")
    docs(spark, sfDir).select(col("doc_id"), pred.as("pred_lang"), g.as("marker_count"))
  }

  /** Rolling-hash document fingerprint via the native Catalyst expression;
    * exact duplicate groups by fingerprint. */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextFingerprint(spark, col("text")).as("fingerprint"))

  /** BPE-style pre-tokenization count: alpha runs, digit runs, punctuation
    * runs (the GPT-2-regex shape restricted to an RE2/Java-compatible
    * subset so the oracle evaluates the identical pattern). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Corpus quality filter: the keep/drop decision a training-data pipeline
    * applies from the quality signals — token count floor, stopword-ratio
    * band, chars-per-token ceiling (boilerplate/code smell). Emitted as a
    * verdict with per-signal booleans so drops are attributable. */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val stop = occ(concat(lit(" "), col("text"), lit(" ")), " the ") +
      occ(concat(lit(" "), col("text"), lit(" ")), " a ")
    val stopRatio = stop.cast("double") / nTok
    val cpt = length(col("text")).cast("double") / nTok
    val lenOk = nTok >= 20
    val stopOk = stopRatio >= 0.01 && stopRatio <= 0.5
    val cptOk = cpt <= 12.0
    docs(spark, sfDir).select(
      col("doc_id"),
      lenOk.as("len_ok"),
      stopOk.as("stop_ok"),
      cptOk.as("cpt_ok"),
      (lenOk && stopOk && cptOk).as("keep"))
  }

  /** Deterministic content-hash train/val/test split (90/5/5) — THE split
    * a training pipeline wants: the bucket is a pure function of the text
    * (rolling fingerprint mod 100), so byte-identical documents always
    * land in the same split and exact duplicates can never straddle
    * train/test. Contrast with an id- or position-based split, whose
    * near-dup leakage [[graft.dedup.Dedup.contamination]] measures. */
  def splitAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(TextFingerprint(spark, col("text")), lit(100L))
    docs(spark, sfDir).select(
      col("doc_id"),
      bucket.cast("long").as("bucket"),
      when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"))
  }

  private val D = "documents"

  /** The rolling-fingerprint fold as a shared SQL fragment — yields
    * (doc_id, fingerprint BIGINT); interpolated into BOTH ta_fingerprint
    * and ta_split so the two oracles can never diverge. */
  private val FingerprintSql: String =
    s"""SELECT doc_id,
       |  CAST(CASE WHEN fp_u >= 9223372036854775808 THEN fp_u - 18446744073709551616
       |            ELSE fp_u END AS BIGINT) AS fingerprint
       |FROM (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS HUGEINT),
       |      [CAST(unicode(x) AS HUGEINT) for x in regexp_split_to_array(reverse(text), '')]),
       |    (h, c) -> (h * 31 + c) % 18446744073709551616) AS fp_u
       |  FROM $D)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the ta_fingerprint fold, bucketed: pmod(fp, 100) in Spark =
    // ((fp % 100) + 100) % 100 over the re-signed BIGINT in DuckDB
    "ta_split" ->
      s"""SELECT doc_id, b AS bucket,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, ((fingerprint % 100) + 100) % 100 AS b
         |  FROM ($FingerprintSql))""".stripMargin,
    // the rolling hash fp(s) = sum_i s[i]*31^i mod 2^64 re-expressed as a
    // left fold over the reversed string (Horner), in HUGEINT with an
    // explicit mod-2^64 per step, then re-signed to match Spark's LongType
    "ta_fingerprint" -> FingerprintSql,
    "ta_bpe" ->
      s"""SELECT doc_id,
         |  cast(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe_tokens
         |FROM $D""".stripMargin,
    "ta_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    cast(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         |    ((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
         |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3
         |    ) * 1.0 / length(regexp_split_to_array(trim(text), '\\s+')) AS stop_ratio,
         |    length(text) * 1.0 / length(regexp_split_to_array(trim(text), '\\s+')) AS cpt
         |  FROM $D
         |)
         |SELECT doc_id,
         |  n_tok >= 20 AS len_ok,
         |  stop_ratio >= 0.01 AND stop_ratio <= 0.5 AS stop_ok,
         |  cpt <= 12.0 AS cpt_ok,
         |  (n_tok >= 20) AND (stop_ratio >= 0.01 AND stop_ratio <= 0.5) AND (cpt <= 12.0) AS keep
         |FROM q""".stripMargin,
    "ta_tokens" ->
      s"""SELECT doc_id,
         |  cast(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  cast(length(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_distinct
         |FROM $D""".stripMargin,
    "ta_quality" ->
      s"""SELECT doc_id,
         |  cast(length(text) AS BIGINT) AS n_chars_actual,
         |  cast(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  round((
         |      (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
         |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3
         |    ) * 1.0 / length(regexp_split_to_array(trim(text), '\\s+')), 4) AS stopword_ratio,
         |  round(length(text) * 1.0 / length(regexp_split_to_array(trim(text), '\\s+')), 4) AS chars_per_token
         |FROM $D""".stripMargin,
    "ta_langid" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
         |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS c_en,
         |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' der ', ''))) / 5
         |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' und ', ''))) / 5 AS c_de,
         |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' el ', ''))) / 4
         |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' y ', ''))) / 3 AS c_es,
         |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' le ', ''))) / 4
         |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' et ', ''))) / 4 AS c_fr
         |  FROM $D
         |)
         |SELECT doc_id,
         |  CASE WHEN greatest(c_en, c_de, c_es, c_fr) = 0 THEN 'unk'
         |       WHEN c_en = greatest(c_en, c_de, c_es, c_fr) THEN 'en'
         |       WHEN c_de = greatest(c_en, c_de, c_es, c_fr) THEN 'de'
         |       WHEN c_es = greatest(c_en, c_de, c_es, c_fr) THEN 'es'
         |       ELSE 'fr' END AS pred_lang,
         |  cast(greatest(c_en, c_de, c_es, c_fr) AS BIGINT) AS marker_count
         |FROM m""".stripMargin
  )
}
