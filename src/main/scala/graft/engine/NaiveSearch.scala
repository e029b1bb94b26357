package graft.engine

import graft.corpus.Corpus
import graft.score.BM25
import graft.tokenize.Tokenizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The naive full-scoring BM25 top-k plan — SURVEY.md §7 Step 1.
  *
  * This is the engine's correctness oracle: zero custom operators, every
  * stage a Catalyst built-in, logically identical to the DuckDB SQL in
  * [[graft.corpus.OracleSql.bm25TopK]]. The index and WAND paths must match
  * it rank-for-rank (the north rule's rank-identity criterion).
  *
  * Plan shape (scale notes, 1000-executor reasoning):
  *  - query set is tiny → `broadcast` both the query terms and the
  *    query-restricted df table (SURVEY.md J5): no shuffle of the big tf
  *    relation on `term` at query time;
  *  - tf and doclen are both keyed by doc_id and doclen derives from tf, so
  *    the doc_id equi-join reuses the aggregation's hash partitioning;
  *  - corpus stats (N, avgdl) are a 1-row aggregate, cross-joined broadcast.
  */
object NaiveSearch {

  /** Scores every (query, doc) pair for the given query rows
    * `(query_id, term, k)`; returns `(query_id, k, doc_id, score)`.
    */
  def scoreAll(corpusWithId: DataFrame, queries: DataFrame): DataFrame = {
    // tf feeds four plan branches (scored join, dfq, dl, stats); without a
    // persist the corpus synthesis + tokenize pipeline executes four times
    val tf = Tokenizer.termFreqs(corpusWithId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = Tokenizer.docLens(tf)             // (doc_id, dl)
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val qTerms = queries.select("query_id", "term", "k")
    val dfq = dfreq.join(broadcast(qTerms.select("term").distinct()), "term")

    tf.join(broadcast(qTerms), "term")
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "k", "doc_id")
      .agg(sum(BM25.score(col("tf"), col("df"), col("dl"), col("n"), col("avgdl"))).as("score"))
  }

  /** Full oracle-shaped result: `(query_id, rank, repo, path, commit,
    * score_r)`, ranked by quantized score desc then natural key asc —
    * the pinned total order shared with DuckDB.
    */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame): DataFrame = {
    val c = Corpus.withDocId(corpus)
    val scored = scoreAll(c, queries)
    rankByKeys(scored.join(c.select("doc_id", "repo", "path", "commit"), "doc_id"))
  }

  /** Shared ranking tail: input must have (query_id, k, repo, path, commit,
    * score); emits the pinned oracle output shape.
    *
    * Scale shape: a k-bounded [[TopKAggExprs]] heap aggregate with map-side
    * partial aggregation — NOT a `Window.partitionBy(query_id)`, which would
    * funnel every candidate of a hot-term query through one task. The
    * exchange moves ≤ tasks×k pre-reduced rows; rank = position in the
    * aggregate's pinned (score_r desc, repo/path/commit asc) order, which is
    * exactly the oracle's `row_number()` order.
    */
  def rankByKeys(scoredWithKeys: DataFrame): DataFrame =
    sortedTail(rankByKeysUnsorted(scoredWithKeys))

  /** The ranking aggregate WITHOUT the output-edge sort — for callers that
    * union more final-shaped rows in before sorting ([[Wand.topKAt]]'s
    * driver-local fast rows), so the tail pays exactly ONE single-partition
    * sort, not one per union arm.
    */
  private[graft] def rankByKeysUnsorted(scoredWithKeys: DataFrame): DataFrame = {
    val hits = scoredWithKeys
      .groupBy("query_id")
      .agg(TopKAggExprs.topK(col("k"), BM25.quantize(col("score")),
        struct(col("repo"), col("path"), col("commit"))).as("hits"))
    hits
      .select(col("query_id"), posexplode(col("hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.repo"), col("col.path"), col("col.commit"), col("col.score_r"))
  }

  /** Output-edge total order over a final-shaped (≤ Σ k rows) result: a
    * single-partition sort gives the same order as `orderBy` WITHOUT the
    * range partitioner's per-query sampling job + exchange.
    */
  private[graft] def sortedTail(ranked: DataFrame): DataFrame =
    ranked.coalesce(1).sortWithinPartitions("query_id", "rank")
}
