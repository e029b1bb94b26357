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
    layers: Seq[IndexLayer], docs: DataFrame, cacheTag: String,
    fast: Option[DataFrame]) {

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

  // repo-scope key -> lazily-built broadcast scope probe. A bare
  // TrieMap.getOrElseUpdate may evaluate the thunk on BOTH racing threads
  // (the same hazard IndexReader.open guards with openLock) — the loser's
  // scope scan would be a duplicate Spark job and its broadcast would
  // linger un-released until GC, since invalidate() only releases probes
  // that won the cache slot. PER-KEY cells (not one global lock): probe
  // construction runs a driver-blocking Spark job, and a single monitor
  // held across it would serialize cold probes for UNRELATED scopes.
  // getOrElseUpdate may still race two Cell ALLOCATIONS, but a Cell is
  // side-effect-free until its lazy body is forced, and both racers force
  // the one cell that won the slot — exactly one scan, one broadcast.
  private[engine] final class ProbeCell(thunk: () => ScopeProbe) {
    @volatile private var built = false
    lazy val probe: ScopeProbe = { val p = thunk(); built = true; p }
    /** The probe iff some caller already forced it — invalidate() must not
      * BUILD probes just to release them.
      */
    def ifBuilt: Option[ScopeProbe] = if (built) Some(probe) else None
  }
  private[engine] val scopeCache = TrieMap.empty[String, ProbeCell]

  // term -> its fast-list row, or None (no fast list / absent term)
  private val fastCache = TrieMap.empty[String, Option[FastList]]
  // serializes COLD batched prefetches only (see prefetchFastLists)
  private val fastPrefetchLock = new Object

  /** The impact-ordered top-k prefix of one term (`fast/` sidecar): parallel
    * arrays in the FINAL total order, v7 including the natural doc keys —
    * present only for hot terms (df ≥ [[IndexBuilder.FastMinDf]]). Layered
    * roots serve the sidecar rebuilt at the CURRENT avgdl by the last
    * addBatch/compact. Driver-cached per reader: one bucket-pruned probe per
    * distinct term, then zero Spark jobs (the prefix is
    * [[IndexBuilder.FastK]]-sized — termMeta-sized, not postings-sized).
    */
  def fastList(term: String): Option[FastList] =
    fast match {
      case None => None
      case Some(f) =>
        fastCache.getOrElseUpdate(term, {
          import f.sparkSession.implicits._
          f.filter(col("bucket") === TermHash.bucket(term, stats.numBuckets))
            .filter(col("term") === term)
            .select("df", "doc_ids", "tfs", "dls", "repos", "paths", "commits")
            .as[(Long, Array[Long], Array[Int], Array[Long], Array[String], Array[String], Array[String])]
            .collect().headOption
            .map { case (df, ids, tfs, dls, repos, paths, commits) =>
              FastList(df, ids, tfs, dls, repos, paths, commits)
            }
        })
    }

  /** Batched fast-list warmup for a query batch: ONE bucket-pruned probe
    * covers every not-yet-cached term (the per-term [[fastList]] path costs
    * one Spark job per cold term — a cold batch with T distinct hot terms
    * would pay T serial jobs, this pays 1). Terms already known rare from
    * [[termMeta]] (df < [[IndexBuilder.FastMinDf]]) cannot have fast lists
    * by construction and are cached as absent with zero jobs.
    */
  def prefetchFastLists(terms: Seq[String]): Unit = fast match {
    case None => ()
    case Some(f) =>
      // cold-only lock (warm batches return on the contains-check without
      // touching it): two concurrent cold batches would otherwise both
      // compute `missing` and both run the probe job — the same
      // check-then-act hazard the scope-probe cells guard against. One
      // monitor is fine HERE because all prefetches probe the same shared
      // sidecar (there is no unrelated-key work to serialize, unlike
      // scopes), and the loser's re-check inside the lock sees the winner's
      // cache fills and probes only what is still missing.
      if (terms.distinct.forall(fastCache.contains)) return
      fastPrefetchLock.synchronized {
        val missing = terms.distinct.filterNot(fastCache.contains)
        val (knownRare, candidates) = missing.partition(t =>
          termCache.get(t).exists(_._1 < IndexBuilder.FastMinDf))
        knownRare.foreach(fastCache.put(_, None))
        if (candidates.nonEmpty) {
          import f.sparkSession.implicits._
          val buckets = candidates.map(TermHash.bucket(_, stats.numBuckets)).distinct
          val rows = f.filter(col("bucket").isin(buckets: _*))
            .filter(col("term").isin(candidates: _*))
            .select("term", "df", "doc_ids", "tfs", "dls", "repos", "paths", "commits")
            .as[(String, Long, Array[Long], Array[Int], Array[Long], Array[String], Array[String], Array[String])]
            .collect()
          rows.foreach { case (t, df, ids, tfs, dls, repos, paths, commits) =>
            fastCache.put(t, Some(FastList(df, ids, tfs, dls, repos, paths, commits)))
          }
          val found = rows.iterator.map(_._1).toSet
          candidates.filterNot(found).foreach(fastCache.put(_, None))
        }
      }
  }

  /** Membership structure for the query-scoped corpus restriction, cached
    * per reader + scope key (the one docs-sidecar scan it costs runs once
    * per distinct scope, then scoped queries plan with zero extra jobs).
    *
    * Two regimes, chosen by measured scope size:
    *  - up to [[IndexReader.scopeExactMax]] docs -> a broadcast SORTED docId
    *    array, binary search per candidate: EXACT (selective scopes
    *    broadcast like dimension tables);
    *  - larger -> a broadcast Bloom filter (fpp [[IndexReader.ScopeBloomFpp]]):
    *    no false negatives, so every in-scope doc is still evaluated; the
    *    rare false positive is removed EXACTLY in the ranking tail (the
    *    docs join re-filters by repo). The residual risk is only that an FP
    *    transiently occupies a shard-heap slot and lifts that shard's prune
    *    threshold past a boundary true hit — probability ≈ fpp × evaluated
    *    candidates per query, the standard bloom-scoping tradeoff at corpus
    *    sizes where an id-array broadcast (8 B/doc) stops fitting.
    */
  def scopeProbe(repos: Seq[String]): ScopeProbe = {
    val key = repos.distinct.sorted.mkString("\u0000")
    scopeCache.getOrElseUpdate(key, new ProbeCell(() => {
      val spark = docs.sparkSession
      import spark.implicits._
      val scoped = docs.filter(col("repo").isin(repos.distinct: _*)).select("doc_id")
      // regime probe and id fetch in ONE job: collect up to exactMax+1 ids —
      // overflow (the rare huge-scope regime) is the only case that pays the
      // extra count() the bloom sizing needs. A separate count()-then-collect
      // would scan the docs sidecar twice for every common selective scope.
      val exactMax = math.min(IndexReader.scopeExactMax, (Int.MaxValue - 8).toLong).toInt
      val ids = scoped.limit(exactMax + 1).as[Long].collect()
      if (ids.length <= exactMax) {
        java.util.Arrays.sort(ids)
        ExactScope(spark.sparkContext.broadcast(ids))
      } else {
        BloomScope(spark.sparkContext.broadcast(
          scoped.stat.bloomFilter("doc_id", scoped.count(), IndexReader.ScopeBloomFpp)))
      }
    })).probe
  }
}

/** One term's driver-resident impact-ordered prefix (v7 fast sidecar):
  * parallel arrays, already in the final (score_r desc, key asc) order.
  */
final case class FastList(
    df: Long, ids: Array[Long], tfs: Array[Int], dls: Array[Long],
    repos: Array[String], paths: Array[String], commits: Array[String])

/** Executor-shippable scope membership probe (see [[IndexReader.scopeProbe]]).
  * `exact` tells the ranking tail whether an FP re-filter is needed.
  */
sealed trait ScopeProbe extends Serializable {
  def exact: Boolean
  /** A serializable membership function (built so the closure captures the
    * broadcast handle, not the whole probe).
    */
  def fn: Long => Boolean
  /** Drop the probe's executor-side broadcast blocks WITHOUT invalidating
    * the broadcast: in-flight scoped queries (serve-while-mutating is the
    * advertised steady state) keep working — a task that lost its executor
    * copy re-fetches from the driver. `destroy()` here would make their
    * retries throw "Attempted to use Broadcast after it was destroyed".
    * Final destruction is the ContextCleaner's, once the last driver
    * reference (the scopeCache entry) is dropped.
    */
  def release(): Unit
}

final case class ExactScope(
    ids: org.apache.spark.broadcast.Broadcast[Array[Long]]) extends ScopeProbe {
  override def exact: Boolean = true
  override def fn: Long => Boolean = {
    val bc = ids
    d => java.util.Arrays.binarySearch(bc.value, d) >= 0
  }
  override def release(): Unit = ids.unpersist()
}

final case class BloomScope(
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) extends ScopeProbe {
  override def exact: Boolean = false
  override def fn: Long => Boolean = {
    val bc = bloom
    d => bc.value.mightContainLong(d)
  }
  override def release(): Unit = bloom.unpersist()
}

object IndexReader {

  /** Scope sizes up to this many docIds use the exact broadcast-array probe;
    * larger scopes fall back to a Bloom filter (see [[IndexReader.scopeProbe]]).
    * Default 4M ids = 32 MB broadcast — comfortably a "dimension table".
    * A `var` (env-seeded) so specs can force the bloom regime at tiny sf;
    * production tuning goes through `GRAFT_SCOPE_EXACT_MAX`.
    */
  @volatile var scopeExactMax: Long =
    sys.env.get("GRAFT_SCOPE_EXACT_MAX").map { v =>
      // fail with the cause named: a bare .toLong here would surface as an
      // opaque ExceptionInInitializerError on the first IndexReader.get
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"GRAFT_SCOPE_EXACT_MAX must be an integer number of docIds, got '$v'"))
    }.getOrElse(4L * 1024 * 1024)

  /** False-positive rate of the bloom scope probe — at 1e-6, an FP among a
    * query's ~10^4 evaluated candidates is a ~1% event, and each FP is still
    * removed exactly in the ranking tail's repo re-filter.
    */
  val ScopeBloomFpp: Double = 1e-6

  // keyed by (session identity, root): DataFrames are bound to the session
  // that created them. Entries for STOPPED sessions are evicted on access
  // (sequential suites in one JVM must not alias a dead session's plans).
  private val cache = TrieMap.empty[(Int, String), IndexReader]
  // guards open(): TrieMap.getOrElseUpdate may evaluate the thunk on BOTH
  // racing threads, and the loser's persisted layer DataFrames would leak
  // executor storage memory for the session's lifetime (round-3 advice).
  // open() itself is metadata reads + LAZY persists (no Spark jobs), so a
  // single lock adds no contention worth striping.
  private val openLock = new Object

  def get(spark: SparkSession, paths: IndexPaths): IndexReader = {
    val key = (System.identityHashCode(spark), paths.root)
    cache.get(key).foreach { r =>
      if (r.docs.sparkSession.sparkContext.isStopped) cache.remove(key)
    }
    cache.get(key).getOrElse(openLock.synchronized {
      cache.getOrElseUpdate(key, open(spark, paths))
    })
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
          val seg = pinSegments(spark.read.schema(IndexBuilder.SegmentsSchema)
            .parquet(snap.segmentsDirs(i)))
          IndexLayer(i, snap.indexDirs(i), layerStats.avgdl,
            math.max(1.0, stats.avgdl / layerStats.avgdl), idx, seg)
        }
        val docs = pinDocs(snap.docsDirs
          .map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
          .reduce(_ unionByName _))
        IndexReader(paths, stats, snap.version, layers, docs,
          cacheTag(paths, stats, snap.version),
          fastFor(spark, Some(snap.indexDirs.last)))

      case None =>
        val stats = IndexBuilder.open(paths)
        val idx = spark.read.parquet(paths.indexDir).persist(StorageLevel.MEMORY_AND_DISK)
        val seg = pinSegments(
          spark.read.schema(IndexBuilder.SegmentsSchema).parquet(paths.segmentsDir))
        val docs = pinDocs(spark.read.schema(IndexBuilder.DocsSchema).parquet(paths.docsDir))
        IndexReader(paths, stats, 0,
          Seq(IndexLayer(0, paths.indexDir, stats.avgdl, 1.0, idx, seg)),
          docs, cacheTag(paths, stats, 0), fastFor(spark, Some(paths.indexDir)))
    }

  /** Pin the docs sidecar hash-partitioned AND sorted by `doc_id` (guide
    * §2.4: two operations keyed the same way share one exchange — a cached
    * partitioning persists across jobs like a bucketed table). The
    * full-materialization index paths join per-query candidate scores to
    * this relation on `doc_id`; with a scan-partitioned cache every query
    * re-exchanged AND re-sorted the corpus-sized side, which was the
    * dominant fixed cost of [[IndexSearch.topKAt]] (r6 measurement:
    * ~0.4 s/query at sf0.1×32). The one-time shuffle+sort here is paid at
    * reader open (the serving steady state the resident reader models).
    */
  private def pinDocs(docs: DataFrame): DataFrame =
    persistPartitioned(docs.repartition(col("doc_id")).sortWithinPartitions("doc_id"))

  /** Pin a segments layer hash-partitioned by `salt` (every row of a salt
    * shard in exactly one cached partition — the invariant the single-layer
    * WAND mapPartitions route relies on: one task sees ALL of a (salt,
    * query)'s term rows, so shard runs stay docId-disjoint) and sorted by
    * (salt, bucket, term) so the in-memory batch min/max stats keep the
    * per-query bucket/term filters prunable.
    */
  private def pinSegments(segs: DataFrame): DataFrame =
    persistPartitioned(
      segs.repartition(col("salt")).sortWithinPartitions("salt", "bucket", "term"))

  /** Persist with the partitioning/ordering STATICALLY visible to consumers.
    * Under AQE (Spark 4 default) a cached query compiles as an
    * `AdaptiveSparkPlan` whose output partitioning consumers cannot trust,
    * so every downstream join re-exchanges AND re-sorts the cached side —
    * exactly the per-query cost the pin exists to remove. The cached plan is
    * captured at `persist()` time, so AQE is toggled off around just that
    * call: the CACHE BUILD of a reader-pinned relation is a single
    * deliberate exchange+sort that needs no adaptivity, while every query
    * over it still runs with AQE on. (Verified against
    * `plans/r06/bm25_index_topk_after.txt`: the docs side of the keys join
    * is a bare InMemoryTableScan, no Exchange, no Sort.)
    *
    * Concurrency: the whole toggle-persist-restore runs under one global
    * lock — two unsynchronized callers could otherwise interleave their
    * read-prev/set/restore and leave AQE disabled for the session (thread A
    * reads "true"/sets false, thread B reads "false", A restores "true",
    * B "restores" false). persist() registers the cache without running a
    * job, so the critical section is cheap. A query PLANNED by an unrelated
    * thread inside the window still compiles without AQE — correct,
    * marginally less adaptive, and bounded to the pin call.
    */
  private val pinLock = new Object

  private[graft] def persistPartitioned(df: DataFrame): DataFrame = pinLock.synchronized {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.persist(StorageLevel.MEMORY_AND_DISK)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  /** Fast sidecar beside the NEWEST layer's index dir. v7 invariant: every
    * publish path writes (or rebuilds) the sidecar next to the newest index
    * dir at the CURRENT stats — full build and compact via
    * [[IndexBuilder.buildPostingsPhases]], incremental adds via the
    * [[graft.index.Incremental.addBatch]] whole-sidecar re-rank (tfNorm
    * ORDER is not avgdl-stable, so prefixes ranked at an older avgdl must
    * never be served). Absent `_SUCCESS` (a pre-v7 or hand-assembled root)
    * disables the fast route rather than serving a stale order.
    */
  private def fastFor(spark: SparkSession, newestIndexDir: Option[String]): Option[DataFrame] =
    newestIndexDir.flatMap { idx =>
      val dir = graft.index.IndexPaths.fastDirFor(idx)
      if (Files.exists(Paths.get(s"$dir/_SUCCESS")))
        Some(spark.read.schema(IndexBuilder.FastSchema).parquet(dir)
          .persist(StorageLevel.MEMORY_AND_DISK))
      else None
    }

  /** [[PostingCache]] key prefix: root + snapshot version + full build
    * stats + the stats file's write-time nonce, so ANY rebuild — including
    * a same-stats rebuild under different salting — changes the key and a
    * multi-executor cluster can never serve stale decoded sub-lists.
    * The nonce is a random UUID written INTO the stats JSON at build time
    * ([[IndexBuilder.writeStatsJson]]): unlike the previous mtime-millis
    * nonce, two rebuilds landing in the same millisecond still differ; file
    * mtime remains the fallback for pre-nonce stats files.
    * Driver-side [[invalidate]] is best-effort on top, not load-bearing.
    */
  private def cacheTag(paths: IndexPaths, stats: IndexStats, snapVersion: Int): String = {
    val p = Paths.get(paths.statsPath)
    val nonce = IndexBuilder.readJsonString(p, "nonce").getOrElse(
      if (Files.exists(p)) Files.getLastModifiedTime(p).toMillis.toString else "0")
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
          r.fast.foreach(_.unpersist())
        }
        // scope probes are broadcasts, not persisted plans: RELEASE (not
        // destroy) them so a long-lived serving session with many distinct
        // scopes does not accumulate executor broadcast blocks across
        // rebuilds (round-4 advice), while scoped queries still in flight
        // against the evicted reader keep working — unpersist leaves the
        // broadcast re-fetchable from the driver, and clearing the cache
        // below drops the last strong reference so the ContextCleaner
        // finishes destruction once nothing holds the handle.
        r.scopeCache.values.foreach { cell =>
          // release only probes someone actually built — forcing an
          // unevaluated cell here would run its scope scan just to drop it
          cell.ifBuilt.foreach(p => try p.release() catch { case _: Exception => () })
        }
        r.scopeCache.clear()
      }
    }
    PostingCache.invalidatePrefix(root)
  }
}
