package graft.tokenize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The tokenizer — the engine analog of the reference's per-document link
  * extraction `FetchChildPages` (`pkg/page/page.go:64-90`): document in,
  * normalized child records out, deduped per document. The reference keeps
  * first-occurrence-only (`localProcessed`, page.go:76-78); the engine keeps
  * the occurrence count as the term frequency, which BM25 needs.
  *
  * v1 is pure built-ins (`split` + `explode` + `groupBy`) so the whole path
  * stays inside WholeStageCodegen — no UDF, no custom Generator needed.
  */
object Tokenizer {

  /** Split regex: token chars are [a-z0-9_]; everything else separates.
    * Lowercasing first ≙ the reference's URL canonicalization
    * (`pkg/page/page.go:80, 110-115`): index-time and query-time MUST apply
    * the same normalization.
    */
  val SplitRegex: String = "[^a-z0-9_]+"

  /** Normalize one query/lookup term exactly like index-time tokens. */
  def normalizeTerm(t: String): String = t.toLowerCase

  /** Array-of-tokens column for a content column (empties filtered). */
  def tokensCol(content: Column): Column =
    filter(split(lower(content), SplitRegex), t => t =!= "")

  /** Explode a corpus (must carry `doc_id`, `content`) to term frequencies:
    * `(doc_id, term, tf)` — operator E1+A1 of SURVEY.md §2.
    */
  def termFreqs(corpusWithId: DataFrame): DataFrame =
    corpusWithId
      .select(col("doc_id"), explode(tokensCol(col("content"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Document lengths `(doc_id, dl)` = Σ tf — input to BM25 normalization. */
  def docLens(termFreqs: DataFrame): DataFrame =
    termFreqs.groupBy("doc_id").agg(sum("tf").as("dl"))
}
