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
    * `(doc_id, term, tf)` — operator E1+A1 of SURVEY.md §2. Pure built-ins;
    * this is the oracle-shaped formulation (used by the naive plan and the
    * tokenize_tf verification query).
    */
  def termFreqs(corpusWithId: DataFrame): DataFrame =
    corpusWithId
      .select(col("doc_id"), explode(tokensCol(col("content"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Document lengths `(doc_id, dl)` = Σ tf — input to BM25 normalization. */
  def docLens(termFreqs: DataFrame): DataFrame =
    termFreqs.groupBy("doc_id").agg(sum("tf").as("dl"))

  /** Shuffle-free tf: `(doc_id, term, tf, dl)` computed entirely map-side.
    * Per-document aggregation is embarrassingly local (every occurrence of
    * a doc's tokens lives in its row), so the explode → groupBy(doc_id,
    * term) formulation above shuffles 10-100× more rows than it needs to —
    * at sf0.1×4 that is a 200 M-row exchange for a 50 M-row result. The
    * engine build path uses this; [[TokenizerSpec]] pins equality of the
    * two formulations, and the same JVM regex semantics apply (Spark's
    * `split` is java.util.regex, as is `Pattern.split` here; trailing empty
    * strings are filtered on both paths).
    */
  def termFreqsWithDl(corpusWithId: DataFrame): DataFrame = {
    val spark = corpusWithId.sparkSession
    import spark.implicits._
    val re = java.util.regex.Pattern.compile(SplitRegex)
    corpusWithId
      .select(col("doc_id"), col("content"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (docId, content) =>
          val counts = new java.util.HashMap[String, Int]()
          var dl = 0L
          val toks = re.split(content.toLowerCase, -1)
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            if (t.nonEmpty) { counts.merge(t, 1, (a, b) => a + b); dl += 1 }
            i += 1
          }
          val d = dl
          scala.jdk.CollectionConverters.IteratorHasAsScala(counts.entrySet().iterator()).asScala
            .map(e => (docId, e.getKey, e.getValue.toLong, d))
        }
      }
      .toDF("doc_id", "term", "tf", "dl")
  }
}
