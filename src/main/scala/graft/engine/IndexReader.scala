package graft.engine

import graft.index.{IndexBuilder, IndexPaths, IndexStats, TermHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** A resident handle on one built index — the engine analog of the
  * reference API server holding its Dgraph connection pool open across
  * requests (`pkg/database/relationship/dgraph.go:25-35`): the global
  * index, salted segments, and docs sidecar are loaded once and kept
  * persisted, so per-query work is pruning + decode + score, not parquet
  * directory listing.
  *
  * At 10^12-doc scale you would pin only the term metadata and let posting
  * blocks stream from storage; at bench scale the whole index fits and the
  * cache models the steady-state service.
  */
final case class IndexReader(
    paths: IndexPaths, stats: IndexStats,
    index: DataFrame, segments: DataFrame, docs: DataFrame) {

  private val dfCache = TrieMap.empty[String, Long]

  /** Cache key prefix for [[PostingCache]]: root + build stats, so a rebuild
    * under the same root cannot serve stale decoded arrays.
    */
  val cacheTag: String = s"${paths.root}@${stats.nDocs}:${stats.totalTokens}"

  /** Global df per term (idf is a per-term constant over the WHOLE corpus).
    * Driver-cached per reader: the term dictionary row is fetched once per
    * distinct term (bucket-pruned scan), then every later query on the same
    * terms runs ZERO Spark jobs here. Absent terms cache as df=0 and are
    * omitted from the result (the 404 analog — no postings to read).
    */
  def dfOf(terms: Seq[String]): Map[String, Long] = {
    import index.sparkSession.implicits._
    val missing = terms.distinct.filterNot(dfCache.contains)
    if (missing.nonEmpty) {
      val buckets = missing.map(TermHash.bucket(_, stats.numBuckets)).distinct
      val found = index
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("term").isin(missing: _*))
        .select("term", "df").as[(String, Long)].collect()
      found.foreach { case (t, d) => dfCache.put(t, d) }
      val seen = found.map(_._1).toSet
      missing.filterNot(seen).foreach(dfCache.put(_, 0L))
    }
    terms.distinct.flatMap(t => dfCache.get(t).filter(_ > 0).map(t -> _)).toMap
  }
}

object IndexReader {

  // keyed by (session identity, root): DataFrames are bound to the session
  // that created them — a handle cached across a session restart would hold
  // plans on a stopped session (sequential suites in one JVM).
  private val cache = TrieMap.empty[(Int, String), IndexReader]

  def get(spark: SparkSession, paths: IndexPaths): IndexReader =
    cache.getOrElseUpdate((System.identityHashCode(spark), paths.root), {
      val stats = IndexBuilder.open(paths)
      val index = spark.read.parquet(paths.indexDir).persist(StorageLevel.MEMORY_AND_DISK)
      val segments = spark.read.parquet(paths.segmentsDir).persist(StorageLevel.MEMORY_AND_DISK)
      val docs = spark.read.parquet(paths.docsDir).persist(StorageLevel.MEMORY_AND_DISK)
      IndexReader(paths, stats, index, segments, docs)
    })

  /** Drop cached readers for a root (used after rebuilds that invalidate it),
    * across all sessions, plus their decoded-postings cache entries.
    */
  def invalidate(root: String): Unit = {
    cache.keys.filter(_._2 == root).foreach { k =>
      cache.remove(k).foreach { r =>
        if (!r.index.sparkSession.sparkContext.isStopped) {
          r.index.unpersist(); r.segments.unpersist(); r.docs.unpersist()
        }
      }
    }
    PostingCache.invalidatePrefix(root)
  }
}
