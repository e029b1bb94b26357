package graft.engine

import graft.index.{IndexBuilder, IndexPaths, IndexStats, Snapshots, TermHash}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** One layer of a (possibly layered) index root. `ordinal` is the position
  * in snapshot order — HIGHER = NEWER, and a term's newest layer wins
  * (LSM newest-wins; each layer's row for a term is the FULL merged posting
  * list as of that layer, so exactly one layer is current per term).
  *
  * `avgdl` is the layer's encode-time average doc length: block-max bounds
  * inside the layer were computed on that grid. `boundScale` is the WAND
  * soundness factor `max(1, avgdl_current / avgdl)` (see
  * [[graft.index.Incremental]] for the monotonicity proof) — exact layers
  * (the newest, or any compacted root) have scale 1.0.
  */
final case class IndexLayer(
    ordinal: Int,
    indexDir: String,
    avgdl: Double,
    boundScale: Double,
    index: DataFrame,
    segments: DataFrame)

/** A resident handle on one index root — the engine analog of the
  * reference API server holding its Dgraph connection pool open across
  * requests (`pkg/database/relationship/dgraph.go:25-35`): all layers of
  * the current snapshot, salted segments, and the docs-sidecar union are
  * loaded once and kept persisted, so per-query work is pruning + decode +
  * score, not parquet directory listing.
  *
  * Layered roots (incremental adds, [[graft.index.Incremental.addBatch]])
  * are served directly: term metadata resolves newest-wins per term, the
  * query paths read exactly one layer's row per term, and docs are the
  * union of the disjoint per-layer sidecars — the reference's
  * query-over-live-store behavior (`dgraph.go:62-92`, `FindNode` serves
  * whatever has been upserted).
  *
  * At 10^12-doc scale you would pin only the term metadata and let posting
  * blocks stream from storage; at bench scale the whole index fits and the
  * cache models the steady-state service.
  */
final case class IndexReader(
    paths: IndexPaths, stats: IndexStats, snapshotVersion: Int,
    layers: Seq[IndexLayer], docs: DataFrame, cacheTag: String) {

  // term → (df, winning layer ordinal); df == 0 → absent in every layer
  private val termCache = TrieMap.empty[String, (Long, Int)]

  /** Newest layer (a single-layer root's only layer). */
  def newest: IndexLayer = layers.last

  /** Per-term metadata for query planning: global df (idf is a per-term
    * constant over the WHOLE corpus — the newest layer's row for a term
    * already merges all older postings of that term) plus the ordinal of
    * the winning (newest-containing) layer. Driver-cached per reader:
    * each distinct term costs one bucket-pruned scan per probed layer
    * ONCE; later queries on the same terms run ZERO Spark jobs here.
    * Absent terms cache as df=0 and are omitted (the 404 analog).
    */
  def termMeta(terms: Seq[String]): Map[String, (Long, Int)] = {
    var missing = terms.distinct.filterNot(termCache.contains)
    var li = layers.length - 1
    while (li >= 0 && missing.nonEmpty) {
      val layer = layers(li)
      import layer.index.sparkSession.implicits._
      val buckets = missing.map(TermHash.bucket(_, stats.numBuckets)).distinct
      val found = layer.index
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("term").isin(missing: _*))
        .select("term", "df").as[(String, Long)].collect()
      found.foreach { case (t, d) => termCache.put(t, (d, layer.ordinal)) }
      val seen = found.map(_._1).toSet
      missing = missing.filterNot(seen)
      li -= 1
    }
    missing.foreach(termCache.put(_, (0L, -1)))
    terms.distinct.flatMap(t => termCache.get(t).filter(_._1 > 0).map(t -> _)).toMap
  }

  /** Global df per term (present terms only). */
  def dfOf(terms: Seq[String]): Map[String, Long] =
    termMeta(terms).map { case (t, (d, _)) => t -> d }
}

object IndexReader {

  // keyed by (session identity, root): DataFrames are bound to the session
  // that created them. Entries for STOPPED sessions are evicted on access
  // (sequential suites in one JVM must not alias a dead session's plans).
  private val cache = TrieMap.empty[(Int, String), IndexReader]

  def get(spark: SparkSession, paths: IndexPaths): IndexReader = {
    val key = (System.identityHashCode(spark), paths.root)
    cache.get(key).foreach { r =>
      if (r.docs.sparkSession.sparkContext.isStopped) cache.remove(key)
    }
    cache.getOrElseUpdate(key, open(spark, paths))
  }

  /** Open a root: snapshot metadata when present (its presence is the
    * completeness watermark for layered roots — a snapshot is only ever
    * published on completion), else the strict manifest-counting
    * [[IndexBuilder.open]] for legacy single-layer roots.
    */
  private def open(spark: SparkSession, paths: IndexPaths): IndexReader =
    Snapshots.read(paths.root) match {
      case Some(snap) =>
        if (snap.segmentsDirs.size != snap.indexDirs.size ||
            snap.statsPaths.size != snap.indexDirs.size)
          throw new IllegalStateException(
            s"snapshot v${snap.version} at ${paths.root} lacks aligned per-layer segments/stats " +
              s"(pre-v${IndexBuilder.FormatVersion} metadata?) — rebuild the root")
        val stats = IndexBuilder.readStatsFile(snap.statsPath).getOrElse(
          throw new IllegalStateException(s"missing stats at ${snap.statsPath}"))
        if (stats.version != IndexBuilder.FormatVersion)
          throw new IllegalStateException(
            s"index at ${paths.root} has format v${stats.version}, reader needs v${IndexBuilder.FormatVersion}")
        val layers = snap.indexDirs.indices.map { i =>
          val layerStats = IndexBuilder.readStatsFile(snap.statsPaths(i)).getOrElse(
            throw new IllegalStateException(s"missing layer stats at ${snap.statsPaths(i)}"))
          // explicit schemas: an EMPTY delta layer (replayed batch) has no
          // parquet files to infer from
          val idx = spark.read.schema(IndexBuilder.IndexSchema)
            .parquet(snap.indexDirs(i)).persist(StorageLevel.MEMORY_AND_DISK)
          val seg = spark.read.schema(IndexBuilder.SegmentsSchema)
            .parquet(snap.segmentsDirs(i)).persist(StorageLevel.MEMORY_AND_DISK)
          IndexLayer(i, snap.indexDirs(i), layerStats.avgdl,
            math.max(1.0, stats.avgdl / layerStats.avgdl), idx, seg)
        }
        val docs = snap.docsDirs
          .map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
          .reduce(_ unionByName _).persist(StorageLevel.MEMORY_AND_DISK)
        IndexReader(paths, stats, snap.version, layers, docs, cacheTag(paths, stats, snap.version))

      case None =>
        val stats = IndexBuilder.open(paths)
        val idx = spark.read.parquet(paths.indexDir).persist(StorageLevel.MEMORY_AND_DISK)
        val seg = spark.read.parquet(paths.segmentsDir).persist(StorageLevel.MEMORY_AND_DISK)
        val docs = spark.read.parquet(paths.docsDir).persist(StorageLevel.MEMORY_AND_DISK)
        IndexReader(paths, stats, 0,
          Seq(IndexLayer(0, paths.indexDir, stats.avgdl, 1.0, idx, seg)),
          docs, cacheTag(paths, stats, 0))
    }

  /** [[PostingCache]] key prefix: root + snapshot version + full build
    * stats + the stats file's write-time nonce, so ANY rebuild — including
    * a same-stats rebuild under different salting — changes the key and a
    * multi-executor cluster can never serve stale decoded sub-lists.
    * Driver-side [[invalidate]] is best-effort on top, not load-bearing.
    */
  private def cacheTag(paths: IndexPaths, stats: IndexStats, snapVersion: Int): String = {
    val nonce = {
      val p = Paths.get(paths.statsPath)
      if (Files.exists(p)) Files.getLastModifiedTime(p).toMillis else 0L
    }
    s"${paths.root}@v$snapVersion:${stats.nDocs}:${stats.totalTokens}:" +
      s"${stats.numSalts}:${stats.numBuckets}:$nonce"
  }

  /** Drop cached readers for a root (used after rebuilds that invalidate it),
    * across all sessions, plus their decoded-postings cache entries.
    */
  def invalidate(root: String): Unit = {
    cache.keys.filter(_._2 == root).foreach { k =>
      cache.remove(k).foreach { r =>
        if (!r.docs.sparkSession.sparkContext.isStopped) {
          r.layers.foreach { l => l.index.unpersist(); l.segments.unpersist() }
          r.docs.unpersist()
        }
      }
    }
    PostingCache.invalidatePrefix(root)
  }
}
