package graft.index

import graft.corpus.Corpus
import graft.tokenize.Tokenizer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index maintenance — SURVEY.md §2.4 J1 + J2, the engine
  * analog of the reference's conditional upserts:
  *
  *  - J1 `FindOrCreateNode` (`pkg/database/relationship/dgraph.go:95-127`,
  *    insert iff absent) → `left_anti` join of the incoming batch against
  *    the already-indexed docIds: only genuinely new docs produce postings;
  *  - J2 `CheckOrCreatePredicate` (`dgraph.go:148-176`, merge edge into
  *    existing edge list) → a Catalyst-planned **sort-merge full_outer
  *    join** of the existing global index with the delta postings on
  *    `term` (`hint("merge")`), each side contributing at most one posting
  *    list per term, combined row-wise by decode→merge→re-encode.
  *
  * Corpus stats (N, avgdl) change with the delta, so merged posting lists
  * are re-encoded with the NEW avgdl — block-max bounds stay exact for
  * WAND (a stale smaller avgdl could understate upper bounds and make WAND
  * prune wrongly).
  */
object Incremental {

  /** Add `newCorpus` (which may overlap the already-indexed corpus) into
    * the index at `basePaths`, writing the merged result to `outPaths`.
    * Returns the new stats.
    */
  def addBatch(
      spark: SparkSession,
      basePaths: IndexPaths,
      newCorpus: DataFrame,
      outPaths: IndexPaths): IndexStats = {
    val baseStats = IndexBuilder.open(basePaths)

    val existingIds = spark.read.parquet(basePaths.docsDir).select("doc_id")
    val incoming = Corpus.withDocId(newCorpus)
    // J1: insert iff absent — idempotent replays, like the reference's
    // @if(eq(len(page),0)) upsert guard.
    val fresh = incoming.join(existingIds, Seq("doc_id"), "left_anti")

    val tf = Tokenizer.termFreqsWithDl(fresh)
    val dl = tf.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("dl")).distinct()

    // new global stats over old ∪ fresh doc lengths
    val oldDls = spark.read.parquet(basePaths.docsDir).select(col("doc_id"), col("dl"))
    val allDls = oldDls.union(dl)
    val sRow = allDls.agg(count(lit(1)), avg(col("dl").cast("double")), sum("dl")).head()
    val newStats = IndexStats(IndexBuilder.FormatVersion, sRow.getLong(0), sRow.getDouble(1),
      sRow.getLong(2), baseStats.numSalts, baseStats.numBuckets)

    // delta postings per term (small batch → single-level aggregation)
    val delta = tf
      .groupBy("term")
      .agg(PostingAggExprs.buildPostings(newStats.avgdl, col("doc_id"), col("tf"), col("dl")).as("p"))
      .select(col("term"), col("p.postings").as("postings_b"), col("p.dls").as("dls_b"))

    val existing = spark.read.parquet(basePaths.indexDir)
      .select(col("term"), col("postings").as("postings_a"), col("dls").as("dls_a"))

    // J2: sort-merge full_outer join on term; each side ≤1 row per term.
    val merged = existing.hint("merge")
      .join(delta, Seq("term"), "full_outer")

    import spark.implicits._
    val avgdl = newStats.avgdl
    val out = merged
      .select("term", "postings_a", "dls_a", "postings_b", "dls_b")
      .as[(String, Array[Byte], Array[Byte], Array[Byte], Array[Byte])]
      .map { case (term, pa, da, pb, db) =>
        val (ids, tfs, dls) = mergePair(pa, da, pb, db)
        val e = Postings.encode(term, ids, tfs, dls, avgdl)
        (term, e.df, e.sumTf, e.postings, e.dls, e.blockMax)
      }
      .toDF("term", "df", "sum_tf", "postings", "dls", "block_max")
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(newStats.numBuckets)).cast("int"))

    out.write.mode("overwrite").partitionBy("bucket").parquet(outPaths.indexDir)

    // docs sidecar: old ∪ fresh
    val freshDocs = fresh.join(dl, "doc_id")
      .select(col("doc_id"), col("repo"), col("path"), col("commit"), col("lang"),
        col("dl"), sha2(col("content"), 256).as("content_sha"))
    spark.read.parquet(basePaths.docsDir).union(freshDocs)
      .write.mode("overwrite").parquet(outPaths.docsDir)
    newStats
  }

  /** Merge two (possibly null) encoded posting lists into sorted parallel
    * arrays — disjoint docId sets (J1 guarantees it), classic 2-way merge.
    */
  private[index] def mergePair(
      pa: Array[Byte], da: Array[Byte],
      pb: Array[Byte], db: Array[Byte]): (Array[Long], Array[Int], Array[Long]) = {
    if (pa == null) return Postings.decode(pb, db)
    if (pb == null) return Postings.decode(pa, da)
    val (ia, ta, la) = Postings.decode(pa, da)
    val (ib, tb, lb) = Postings.decode(pb, db)
    val n = ia.length + ib.length
    val ids = new Array[Long](n); val tfs = new Array[Int](n); val dls = new Array[Long](n)
    var a = 0; var b = 0; var o = 0
    while (a < ia.length || b < ib.length) {
      val takeA = b >= ib.length || (a < ia.length && ia(a) < ib(b))
      if (takeA) { ids(o) = ia(a); tfs(o) = ta(a); dls(o) = la(a); a += 1 }
      else { ids(o) = ib(b); tfs(o) = tb(b); dls(o) = lb(b); b += 1 }
      o += 1
    }
    (ids, tfs, dls)
  }
}
