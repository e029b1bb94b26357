package graft

import graft.corpus.{Corpus, OracleSql}
import graft.engine.NaiveSearch
import graft.queries.QuerySet
import graft.tokenize.Tokenizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB SQL in [[oracleSql]]
  * generated from the same constants (vocab, BM25 literals, query set), so
  * the driver's DuckDB compare is a real cross-engine check, not a tautology.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    bm25Naive(spark, "/root/testdata/sf0.001")

  private def bm25Naive(s: SparkSession, dir: String): DataFrame =
    NaiveSearch.topK(s, Corpus.corpus(s, dir), QuerySet.df(s))

  /** (repo, path, commit, term, tf) over the whole corpus — E1+A1.
    * Unsorted: a global orderBy here would put a range exchange (plus its
    * sampling pass, which recomputes the whole upstream plan) under every
    * consumer. Sort only at output edges.
    */
  private def tokenizeTf(s: SparkSession, dir: String): DataFrame =
    Corpus.corpus(s, dir)
      .select(col("repo"), col("path"), col("commit"),
        explode(Tokenizer.tokensCol(col("content"))).as("term"))
      .groupBy("repo", "path", "commit", "term")
      .agg(count(lit(1)).as("tf"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/J1 dedup + synthesis: the corpus itself, with the sha256 per-row
    // invariant column (F10).
    "corpus_synth" -> ((s, dir) =>
      Corpus.corpus(s, dir)
        .withColumn("content_sha", sha2(col("content"), 256))
        .orderBy("repo", "path", "commit")),

    // E1 tokenize + A1 tf aggregation.
    "tokenize_tf" -> ((s, dir) => tokenizeTf(s, dir).orderBy("repo", "path", "commit", "term")),

    // A4 corpus stats: N, avgdl, total token count.
    "corpus_stats" -> ((s, dir) => {
      val tf = tokenizeTf(s, dir)
      val dl = tf.groupBy("repo", "path", "commit").agg(sum("tf").as("dl"))
      dl.agg(
        count(lit(1)).as("n_docs"),
        graft.score.BM25.quantize(avg(col("dl").cast("double"))).as("avgdl_r"),
        sum("dl").as("total_tokens"))
    }),

    // A3 document frequency (exact, feeds idf).
    "term_df_top100" -> ((s, dir) =>
      tokenizeTf(s, dir)
        .groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("sum_tf"))
        .orderBy(col("df").desc, col("term").asc)
        .limit(100)),

    // §7 Step 1: naive full-scoring BM25 top-k over the reference query set.
    "bm25_naive_topk" -> ((s, dir) => bm25Naive(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "corpus_synth" ->
      s"""WITH ${OracleSql.corpusCte}
         #SELECT repo, path, commit, lang, content, sha256(content) AS content_sha
         #FROM corpus ORDER BY repo, path, commit""".stripMargin('#'),

    "tokenize_tf" ->
      s"""WITH ${OracleSql.corpusCte}, ${OracleSql.tokenCtes}
         #SELECT repo, path, commit, term, tf FROM tf
         #ORDER BY repo, path, commit, term""".stripMargin('#'),

    "corpus_stats" ->
      s"""WITH ${OracleSql.corpusCte}, ${OracleSql.tokenCtes}
         #SELECT count(*) AS n_docs,
         #       ${OracleSql.quant("avg(CAST(dl AS DOUBLE))")} AS avgdl_r,
         #       CAST(sum(dl) AS BIGINT) AS total_tokens
         #FROM doclen""".stripMargin('#'),

    "term_df_top100" ->
      s"""WITH ${OracleSql.corpusCte}, ${OracleSql.tokenCtes}
         #SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS sum_tf
         #FROM tf GROUP BY term
         #ORDER BY df DESC, term ASC LIMIT 100""".stripMargin('#'),

    "bm25_naive_topk" -> OracleSql.bm25TopK(QuerySet.duckValues),
  )
}
