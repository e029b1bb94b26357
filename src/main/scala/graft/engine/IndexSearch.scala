package graft.engine

import graft.index.{IndexBuilder, Postings}
import graft.score.BM25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query execution over the built inverted index — the engine analog of the
  * reference's cache-probe query path (`api/http.go:45-67` + `FindNode`,
  * `pkg/database/relationship/dgraph.go:62-92`): never rescans the corpus,
  * reads only the posting lists of the query terms.
  *
  * Scan discipline (checked via `.explain`): the global index is partitioned
  * by term-hash bucket, so the driver pre-computes the buckets of the query
  * terms and the parquet scan prunes to those directories; the `term IN`
  * predicate additionally lands in PushedFilters. Postings decode is a
  * typed flatMap (one row per term → df rows), after which scoring is the
  * SAME Column expression tree as the naive plan — bit-identical scores.
  */
object IndexSearch {

  /** `(query_id, rank, repo, path, commit, score_r)` via the global index. */
  def topK(spark: SparkSession, sfDir: String, queries: DataFrame): DataFrame = {
    val (paths, _) = IndexBuilder.ensure(spark, sfDir)
    topKAt(spark, paths, queries)
  }

  /** Same, against an already-built (complete) index. */
  def topKAt(spark: SparkSession, paths: graft.index.IndexPaths, queries: DataFrame): DataFrame = {
    val reader = IndexReader.get(spark, paths)
    val stats = reader.stats
    val scored = decodedForQueries(spark, reader, queries)
      .join(broadcast(queries.select("query_id", "term", "k")), "term")
      .groupBy("query_id", "k", "doc_id")
      .agg(sum(BM25.score(col("tf"), col("df"), col("dl"),
        lit(stats.nDocs), lit(stats.avgdl))).as("score"))
    val docs = reader.docs.select("doc_id", "repo", "path", "commit")
    NaiveSearch.rankByKeys(scored.join(docs, "doc_id"))
  }

  /** Conjunctive (AND) top-k — SURVEY.md §2.7 posting-list intersection,
    * the reference's `CheckPredicate` analog (`dgraph.go:130-145`): a doc
    * scores only if it matched EVERY query term. The intersection is the
    * docId equi-join the groupBy already performs — each (term, doc)
    * contributes one row, so `count(*) == n_terms` ⇔ all terms present.
    * Queries DataFrame carries (query_id, term, k, n_terms).
    */
  def topKAndAt(spark: SparkSession, paths: graft.index.IndexPaths, queries: DataFrame): DataFrame = {
    val reader = IndexReader.get(spark, paths)
    val stats = reader.stats
    val scored = decodedForQueries(spark, reader, queries)
      .join(broadcast(queries.select("query_id", "term", "k", "n_terms")), "term")
      .groupBy("query_id", "k", "n_terms", "doc_id")
      .agg(sum(BM25.score(col("tf"), col("df"), col("dl"),
        lit(stats.nDocs), lit(stats.avgdl))).as("score"),
        count(lit(1)).as("n_matched"))
      .filter(col("n_matched") === col("n_terms"))
    val docs = reader.docs.select("doc_id", "repo", "path", "commit")
    NaiveSearch.rankByKeys(scored.join(docs, "doc_id"))
  }

  /** Bucket-pruned scan + decode of the query terms' posting lists:
    * one row per (term, doc) with (df, tf, dl) — the shared front half of
    * the disjunctive and conjunctive plans.
    */
  private def decodedForQueries(spark: SparkSession, reader: IndexReader, queries: DataFrame): DataFrame = {
    import spark.implicits._
    val stats = reader.stats
    val terms = queries.select("term").distinct().as[String].collect().toSeq
    // bucket(term) must equal the build-side pmod(xxhash64(term), B):
    // TermHash evaluates Spark's own XxHash64Function driver-side (no job).
    val buckets = terms.map(graft.index.TermHash.bucket(_, stats.numBuckets)).distinct

    reader.index
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .select("term", "df", "postings", "dls")
      .as[(String, Long, Array[Byte], Array[Byte])]
      .flatMap { case (term, df, p, d) =>
        val (docIds, tfs, dls) = Postings.decode(p, d)
        Iterator.range(0, docIds.length).map(i => (term, df, docIds(i), tfs(i), dls(i)))
      }
      .toDF("term", "df", "doc_id", "tf", "dl")
  }
}
