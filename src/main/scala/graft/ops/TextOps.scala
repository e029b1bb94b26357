package graft.ops

import graft.score.BM25
import graft.tokenize.Tokenizer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table — language-ID (stopword-list heuristic), quality
  * scoring (length/punct/stopword ratios), token counting (whitespace and
  * code-regex), and canonical document fingerprinting. All pure Column
  * expressions (codegen'd, no UDFs); every constant is shared with the
  * DuckDB oracle in [[OpsOracleSql]].
  */
object TextOps {

  /** Stopword lists for the langid heuristic — tiny on purpose; the
    * contract is determinism, not linguistic accuracy.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  val EnStopwords: Seq[String] = LangStopwords.toMap.apply("en")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def tokens(text: Column): Column = Tokenizer.tokensCol(text)

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** (doc_id, n_ws_tokens, n_terms, n_chars_measured, punct_ratio_r,
    * stopword_ratio_r, quality_r) — quality formula pinned here and in the
    * oracle: 0.4·min(1, terms/100) + 0.4·(1−punct) + 0.2·(1−stop).
    */
  def textStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTerms = size(toks).cast("long")
    val nWs = size(filter(split(col("text"), "\\s+"), t => t =!= "")).cast("long")
    val nChars = length(col("text")).cast("long")
    val punct = length(regexp_replace(col("text"), "[a-zA-Z0-9_\\s]", "")).cast("double")
    val punctRatio = punct / greatest(nChars, lit(1L)).cast("double")
    val stopRatio = hitCount(toks, EnStopwords).cast("double") / greatest(nTerms, lit(1L)).cast("double")
    val quality = lit(0.4) * least(lit(1.0), nTerms.cast("double") / lit(100.0)) +
      lit(0.4) * (lit(1.0) - punctRatio) + lit(0.2) * (lit(1.0) - stopRatio)
    docs.select(
      col("doc_id"),
      nWs.as("n_ws_tokens"),
      nTerms.as("n_terms"),
      nChars.as("n_chars_measured"),
      BM25.quantize(punctRatio).as("punct_ratio_r"),
      BM25.quantize(stopRatio).as("stopword_ratio_r"),
      BM25.quantize(quality).as("quality_r"))
      .orderBy("doc_id")
  }

  /** (doc_id, de_hits, en_hits, es_hits, fr_hits, predicted) — argmax with
    * the fixed preference order en > de > es > fr on ties; all-zero → 'und'.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val hits = LangStopwords.map { case (l, ws) => l -> hitCount(toks, ws).cast("long") }.toMap
    val Seq(de, en, es, fr) = Seq("de", "en", "es", "fr").map(hits)
    val predicted = when(greatest(de, en, es, fr) === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
    docs.select(col("doc_id"), de.as("de_hits"), en.as("en_hits"),
      es.as("es_hits"), fr.as("fr_hits"), predicted.as("predicted"))
      .orderBy("doc_id")
  }

  /** Canonical fingerprint: sha256 of the space-joined sorted distinct token
    * set — docs with identical vocabulary collapse to one group
    * (`canonical_id` = min doc_id). The "document fingerprinting" dedup
    * primitive; rolling-hash variants reduce to the same groupBy shape.
    */
  /** Winnowing constants (Schleimer/Wilkerson/Aiken, the MOSS algorithm):
    * k-gram size and window width. A document's fingerprint set is the
    * distinct minima of each w-window over the rolling k-gram hash
    * sequence — guarantees any shared substring of length ≥ k + w − 1
    * yields at least one shared fingerprint. Single source of truth (incl.
    * the Rabin–Karp hash constants): [[Winnow]].
    */
  val WinnowK: Int = Winnow.K
  val WinnowW: Int = Winnow.W

  /** Sorted distinct winnowing fingerprints of a text column —
    * `array<bigint>` from the single-pass native expression
    * ([[Winnow.fingerprintsCol]]): one O(L) Rabin–Karp scan per document
    * (rolling hash + monotonic-deque window minima) instead of the v6
    * sha256-per-position Column tree, which cost ~two orders of magnitude
    * more arithmetic. The DuckDB oracle evaluates the identical polynomial
    * hash per position ([[OpsOracleSql]]), so cross-engine fingerprints
    * stay bit-equal.
    */
  def winnowFingerprints(text: Column): Column = Winnow.fingerprintsCol(text)

  /** (doc_id, fingerprint) — one row per winnowing fingerprint per doc. */
  def winnow(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(winnowFingerprints(col("text"))).as("fingerprint"))
      .orderBy("doc_id", "fingerprint")

  def fingerprint(docs: DataFrame): DataFrame = {
    // groupBy + join back, not Window.partitionBy(fingerprint): a window
    // funnels each fingerprint group through one task — fatal exactly on the
    // mass-duplicated fingerprints dedup exists to find (see [[Dedup.exact]]).
    val fp = sha2(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))), 256)
    val hashed = docs.select(col("doc_id"), fp.as("fingerprint"))
    val groups = hashed.groupBy("fingerprint")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
    hashed.join(groups, "fingerprint")
      .select("doc_id", "fingerprint", "canonical_id", "group_size")
      .orderBy("doc_id")
  }
}
