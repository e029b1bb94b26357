package graft.engine

import graft.index.{IndexBuilder, IndexPaths, IndexStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    index: DataFrame, segments: DataFrame, docs: DataFrame)

object IndexReader {

  private val cache = TrieMap.empty[String, IndexReader]

  def get(spark: SparkSession, paths: IndexPaths): IndexReader =
    cache.getOrElseUpdate(paths.root, {
      val stats = IndexBuilder.open(paths)
      val index = spark.read.parquet(paths.indexDir).persist(StorageLevel.MEMORY_AND_DISK)
      val segments = spark.read.parquet(paths.segmentsDir).persist(StorageLevel.MEMORY_AND_DISK)
      val docs = spark.read.parquet(paths.docsDir).persist(StorageLevel.MEMORY_AND_DISK)
      IndexReader(paths, stats, index, segments, docs)
    })

  /** Drop a cached reader (used after rebuilds that invalidate the root). */
  def invalidate(root: String): Unit =
    cache.remove(root).foreach { r =>
      r.index.unpersist(); r.segments.unpersist(); r.docs.unpersist()
    }
}
