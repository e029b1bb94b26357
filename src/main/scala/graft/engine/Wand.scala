package graft.engine

import graft.index.{IndexBuilder, Postings}
import graft.model.Query
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Block-max WAND top-k (SURVEY.md §2.6 T5, north rule) — sharded for
  * Spark's execution model:
  *
  *  - the salted SEGMENTS (docId-disjoint shards of every posting list) are
  *    the unit of parallelism: each (salt shard) runs a classic single-node
  *    block-max WAND over its sub-postings for every query, keeping a k-heap
  *    and skipping blocks whose upper bound can't reach the heap threshold;
  *  - shard-local top-k candidates (k + ε-ties) union → the global ranking
  *    tail re-ranks with the pinned (quantized score, natural key) order.
  *
  * Global top-k ⊆ union of shard top-ks, so rank identity with the naive
  * plan is structural, not statistical. The ε slack ([[Eps]]) keeps any doc
  * that could still tie at the boundary after 1e-6 score quantization.
  *
  * Scale notes: a query touches `numSalts × |terms|` sub-posting rows; doc
  * upper bounds use per-term `idf × max(blockMax)` for pivoting and
  * per-block maxima for evaluation skipping. At 10^12 docs each shard's
  * sub-list is ~1/numSalts of the term's postings — numSalts scales with
  * the cluster, and no executor ever materializes a full hot-term list.
  */
object Wand {

  /** Threshold slack ≥ 2× the 1e-6 score-quantization grid (see class doc). */
  val Eps: Double = 1e-5

  /** Hybrid-route guard: a query is hybrid-eligible only while the SUM of
    * its rare terms' dfs stays under this bound — each rare list is
    * < [[graft.index.IndexBuilder.FastMinDf]] postings by definition, but a
    * many-rare-term query could otherwise funnel an unbounded total through
    * the driver collect. Overflow routes to WAND (identical results, no
    * driver materialization). A `var` so specs can exercise the fallback at
    * tiny sf (where no real query set reaches 32 k rare postings);
    * production value is the default.
    */
  @volatile var HybridMaxRarePostings: Long = 32768L

  /** When true, every query takes the full WAND route (fast/hybrid
    * disabled) — results are identical by construction (FastPathSpec pins
    * it); the bench sets this for its `query_wand_*` leg so that key keeps
    * measuring the WAND path itself round-over-round instead of silently
    * becoming an alias of the routed serving path.
    */
  @volatile var ForceWandRoute: Boolean = false

  /** `(query_id, rank, repo, path, commit, score_r)` — rank-identical to
    * [[NaiveSearch.topK]] on every query.
    */
  def topK(spark: SparkSession, sfDir: String, querySet: Seq[Query]): DataFrame = {
    val (paths, _) = IndexBuilder.ensure(spark, sfDir)
    topKAt(spark, paths, querySet)
  }

  /** Same, against an already-built (complete) index — single-layer or
    * LAYERED (an [[graft.index.Incremental]] snapshot root): each query term
    * reads its newest-wins layer's salted segments, and non-newest layers'
    * block-max bounds are multiplied by the layer's `boundScale =
    * max(1, avgdl_now / avgdl_layer)` (monotonicity bound, see
    * [[graft.index.Incremental]]) so pruning stays SOUND while exact
    * scoring uses the current avgdl. Compaction resets scales to 1.
    *
    * Query-time parallelism is `numSalts × |queries|` — each (salt shard,
    * query) pair is one independent WAND run (round 1 keyed by salt alone,
    * welding query parallelism to a build-time constant). Doc-salting is
    * layer-independent, so a doc stays in one salt shard across layers and
    * shard runs remain docId-disjoint. Decoded postings are memoized per
    * (build, layer, salt, term) in the executor-local [[PostingCache]], so
    * a steady-state query stream decodes each hot sub-list once, not per
    * query. Bucket lists and per-term df come from driver-side hashing
    * ([[graft.index.TermHash]]) and the reader's term-metadata cache — zero
    * Spark jobs of per-query planning overhead after warmup.
    */
  def topKAt(
      spark: SparkSession,
      paths: graft.index.IndexPaths,
      querySet: Seq[Query],
      metrics: Option[QueryMetrics] = None,
      repoScope: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val reader = IndexReader.get(spark, paths)
    val stats = reader.stats

    // Query-scoped corpus restriction (the reference's
    // `allow_external_links`-style filter, README.md:41): candidates outside
    // the scoped repos are rejected INSIDE the WAND evaluation loop — before
    // they can enter the heap — so the per-shard top-k is the top-k OF THE
    // SCOPE, not a post-filtered global top-k. Membership is a broadcast
    // probe ([[IndexReader.scopeProbe]]): an exact sorted docId array for
    // selective scopes (the dimension-table case), a Bloom filter once the
    // scope outgrows broadcast-array size — no false negatives, and the
    // ranking tail's docs join re-filters the rare FP exactly. Bounds stay
    // sound either way: block maxima upper-bound every doc, a fortiori the
    // scoped subset.
    val scope = repoScope.map(reader.scopeProbe)

    val n = stats.nDocs
    val avgdl = stats.avgdl

    // FAST PATHS (v6 impact-ordered prefixes) — bench evidence for why:
    // block-max pruning never fires on a flat score distribution (q01
    // "func" evaluated all 598,902 candidates with 0 skips), so hot-term
    // queries need a sublinear candidate set, not better bounds. Routing:
    //
    //  - `single`: one present term, fast-listed → serve the prefix
    //    directly (driver-local rows, zero index jobs). O(k).
    //  - `hybrid`: ≥2 present terms of which EXACTLY ONE is fast-listed
    //    (the others have df < FastMinDf by definition) → candidates =
    //    prefix(hot) ∪ full(rare terms). SOUND: any doc outside the union
    //    contains ONLY the hot term and sits outside its prefix, so all
    //    FastK prefix docs precede it in the final total order (their
    //    totals only grow with rare-term contributions) — it cannot reach
    //    the top k ≤ FastK. Exact scores come from decoding the hot list
    //    RESTRICTED to the candidate set (executor-side binary-search
    //    filter, no full row explosion) plus the full rare lists.
    //    This serves the classic "rare identifier + common keyword" query
    //    in O(k + Σ df_rare) instead of O(N).
    //  - `wand`: everything else — scoped queries, k > FastK, and queries
    //    with 2+ fast-listed terms (a doc containing several hot terms
    //    could outrank both prefixes, so prefix unions are unsound there).
    //
    // The hybrid and WAND paths score with the SAME BM25.score Column
    // expression and feed the same ranking tail; the fast-single path scores
    // on the driver with [[Postings.idf]]/[[Postings.tfNorm]] scalars, which
    // MUST mirror BM25.score's Column tree op-for-op (the bit-equality
    // contract is documented and spec-pinned at the mirror in [[Postings]] —
    // change one side only and fast-route rank identity silently breaks).
    // Rank identity across routes is then by construction, and the shared
    // oracle pins it.
    val fastK = graft.index.IndexBuilder.FastK
    val metaAll = reader.termMeta(querySet.flatMap(_.terms).distinct)
    def presentOf(q: Query): Seq[String] = q.terms.distinct.filter(metaAll.contains)
    // warm the fast-list cache for the whole batch in ONE probe (the
    // per-term path pays one Spark job per cold term; termMeta above already
    // settled dfs, so known-rare terms are skipped without any job)
    if (!ForceWandRoute && scope.isEmpty)
      reader.prefetchFastLists(
        querySet.filter(_.k <= fastK).flatMap(_.terms).distinct.filter(metaAll.contains))
    def fastOf(q: Query): Seq[String] =
      if (!ForceWandRoute && scope.isEmpty && q.k <= fastK)
        presentOf(q).filter(t => reader.fastList(t).isDefined)
      else Nil
    val (fastSingleQs, rest) = querySet.partition(q =>
      presentOf(q).size == 1 && fastOf(q).size == 1)
    // hybrid also requires the rare side to be driver-collectable: each rare
    // list is < FastMinDf postings BY DEFINITION (a bigger term would be
    // fast-listed), but a query with MANY rare terms could still funnel an
    // unbounded total through the driver — enforce Σ df_rare ≤
    // [[HybridMaxRarePostings]] up front (dfs are driver-resident metadata,
    // zero jobs) and route the overflow to WAND, so the bound is a guard,
    // not an emergent property.
    val (hybridQs, wandQs) = rest.partition { q =>
      presentOf(q).size >= 2 && fastOf(q).size == 1 && {
        val hot = fastOf(q).head
        presentOf(q).filterNot(_ == hot).map(t => metaAll(t)._1).sum <= HybridMaxRarePostings
      }
    }
    metrics.foreach { m =>
      m.routedFast.add(fastSingleQs.size.toLong)
      m.routedHybrid.add(hybridQs.size.toLong)
      m.routedWand.add(wandQs.count(q => presentOf(q).nonEmpty).toLong)
      // all-terms-absent queries run NO route (404 analog, zero result rows);
      // counted separately so the four counters sum to the batch size
      m.routedAbsent.add(wandQs.count(q => presentOf(q).isEmpty).toLong)
    }

    // FAST SINGLE — entirely driver-local, ZERO Spark jobs (v7): the stored
    // prefix carries (repo, path, commit) and is already in the final
    // (score_r desc, key asc) order, so the answer is take(k) + scalar
    // re-scoring ([[Postings.idf]]/[[Postings.tfNorm]] mirror the Column
    // tree op-for-op — bit-identical doubles, same oracle hash). The
    // round-4 bench showed this path's 0.27 s p50 was ~100% job-scheduling
    // overhead for 300 driver-resident rows.
    val fastLocal: Seq[(String, Int, String, String, String, Double)] =
      fastSingleQs.flatMap { q =>
        val fl = reader.fastList(presentOf(q).head).get
        val kk = math.min(q.k, fl.ids.length)
        metrics.foreach(_.candidates.add(kk.toLong))
        (0 until kk).map { i =>
          val raw = Postings.idf(fl.df, n) * Postings.tfNorm(fl.tfs(i), fl.dls(i), avgdl)
          (q.queryId, i + 1, fl.repos(i), fl.paths(i), fl.commits(i),
            graft.score.BM25.quantize(raw))
        }
      }
    def fastLocalDf: Option[DataFrame] =
      if (fastSingleQs.isEmpty) None
      else Some(fastLocal.sortBy(r => (r._1, r._2))
        .toDF("query_id", "rank", "repo", "path", "commit", "score_r"))

    val hybridCand: Option[DataFrame] = if (hybridQs.isEmpty) None else {
      // ONE decode pass collects every hybrid query's rare lists (terms
      // deduplicated across queries): a batch of H hybrid queries pays one
      // bounded collect, not H serial jobs at plan-build time (round-4
      // advice). Total rows ≤ Σ per-query caps — driver-bounded by the
      // HybridMaxRarePostings guard above.
      val rareTerms = hybridQs.flatMap { q =>
        presentOf(q).filterNot(_ == fastOf(q).head)
      }.distinct
      val rareByTerm = IndexSearch.decodedTermRows(spark, reader, rareTerms, None)
        .as[(String, Long, Long, Int, Long)].collect().groupBy(_._1)
      Some(hybridQs.map { q =>
        val present = presentOf(q)
        val hot = fastOf(q).head
        val rare = present.filterNot(_ == hot)
        val rareLocal = rare.flatMap(t => rareByTerm.getOrElse(t, Array.empty[(String, Long, Long, Int, Long)]).toSeq)
        val prefixIds = reader.fastList(hot).get.ids
        val wanted = (prefixIds ++ rareLocal.map(_._3)).distinct.sorted
        metrics.foreach(_.candidates.add(wanted.length.toLong))
        val hotRows = IndexSearch.decodedTermRows(spark, reader, Seq(hot), Some(wanted))
        hotRows.unionByName(rareLocal.toDF("term", "df", "doc_id", "tf", "dl"))
          .select(lit(q.queryId).as("query_id"), lit(q.k).as("k"), col("doc_id"),
            graft.score.BM25.score(col("tf"), col("df"), col("dl"),
              lit(n), lit(avgdl)).as("s"))
          .groupBy("query_id", "k", "doc_id")
          .agg(sum(col("s")).as("score"))
      }.reduce(_ unionByName _))
    }

    val meta = metaAll.view.filterKeys(wandQs.flatMap(_.terms).toSet).toMap
    val dfMap: Map[String, Long] = meta.map { case (t, (d, _)) => t -> d }

    val qByIdLocal = wandQs.map(q => q.queryId -> q).toMap
    val cacheTag = reader.cacheTag

    // docs key columns for the ranking tail; a BLOOM scope's rare false
    // positives are removed HERE, exactly (the repo predicate re-checks
    // membership the probe only approximated)
    def docKeys: DataFrame = {
      val base = reader.docs.select("doc_id", "repo", "path", "commit")
      (scope, repoScope) match {
        case (Some(pr), Some(rs)) if !pr.exact => base.filter(col("repo").isin(rs.distinct: _*))
        case _ => base
      }
    }
    // attach the driver-local fast rows (already final-shaped) to the
    // UNSORTED ranked result, then apply the output-edge total order ONCE
    // (queryIds are disjoint across routes by partition; rankByKeys' own
    // sorted form would pay a second single-partition sort on every mixed
    // batch). Output is ≤ Σk rows — a single-partition sort, not orderBy
    // (whose range partitioner runs a sampling job per query).
    def withFast(rankedUnsorted: DataFrame): DataFrame =
      NaiveSearch.sortedTail(fastLocalDf match {
        case Some(f) => rankedUnsorted.unionByName(f)
        case None => rankedUnsorted
      })

    val nonWand: Seq[DataFrame] = hybridCand.toSeq
    if (meta.isEmpty && nonWand.isEmpty)
      // only fast-single and/or all-terms-absent queries remain: answer from
      // the driver — a LocalTableScan collect is ZERO Spark jobs (absent
      // terms are the 404-with-null-results analog and emit nothing)
      return fastLocalDf.getOrElse(
        spark.emptyDataset[(String, Int, String, String, String, Double)]
          .toDF("query_id", "rank", "repo", "path", "commit", "score_r"))
    if (meta.isEmpty)
      return withFast(NaiveSearch.rankByKeysUnsorted(
        docKeys.join(broadcast(nonWand.reduce(_ unionByName _)), "doc_id")))

    // membership closure captures only the broadcast handle (probe.fn), so
    // the shard tasks ship the broadcast, not the reader
    val scopeFn: Long => Boolean = scope.map(_.fn).getOrElse((_: Long) => true)

    val candidates: DataFrame = if (reader.layers.size == 1) {
      // SINGLE-LAYER route (r6): the reader pins each segments layer
      // hash-partitioned by salt, so ALL of a (salt, query)'s term rows
      // live in one cached partition — the per-(salt, query) WAND runs can
      // execute inside mapPartitions with ZERO exchange, instead of
      // shipping every query's encoded posting blobs through a groupByKey
      // shuffle plus its extra stage round-trips (measured: the multi-term
      // serve queries were stage-latency-bound, not CPU-bound). Shard runs
      // stay docId-disjoint because hash partitioning puts every row of a
      // salt in exactly one partition. Layered roots keep the groupByKey
      // shape below — a query's terms can resolve to different layers,
      // whose cached partitions don't align.
      val layer = reader.layers.head
      val layerTerms = meta.keys.toSeq
      val buckets = layerTerms.map(graft.index.TermHash.bucket(_, stats.numBuckets)).distinct
      val qLocal: Array[(String, Int, Array[String])] =
        wandQs.map(q => (q.queryId, q.k, q.terms.distinct.toArray)).toArray
      val ord = layer.ordinal
      val scale = layer.boundScale
      val dfMapL = dfMap
      val tagL = cacheTag
      val nL = n
      val avgdlL = avgdl
      val metricsL = metrics
      layer.segments
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("term").isin(layerTerms: _*))
        .select("salt", "term", "df", "postings", "dls", "block_max", "block_dir")
        .as[(Int, String, Long, Array[Byte], Array[Byte], Seq[Double], Array[Byte])]
        .mapPartitions { it =>
          val bySalt = scala.collection.mutable.LinkedHashMap
            .empty[Int, scala.collection.mutable.HashMap[String, TermList]]
          it.foreach { case (salt, t, segDf, p, d, bm, dir) =>
            val blocks = PostingCache.open(s"$tagL#L$ord", salt, t, segDf, p, d, dir)
            val scaled = if (scale == 1.0) bm.toArray else bm.iterator.map(_ * scale).toArray
            bySalt.getOrElseUpdate(salt, scala.collection.mutable.HashMap.empty)
              .put(t, TermList(t, Postings.idf(dfMapL(t), nL), blocks, scaled))
          }
          bySalt.iterator.flatMap { case (_, byTerm) =>
            qLocal.iterator.flatMap { case (qid, k, terms) =>
              val lists = terms.flatMap(byTerm.get).toSeq
              if (lists.isEmpty) Iterator.empty
              else {
                val decodedBefore =
                  if (metricsL.isDefined) lists.iterator.map(_.blocks.decodedBlocks.toLong).sum else 0L
                val counters = new WandCounters
                val res = wandShardTopK(lists, k, avgdlL, counters, scopeFn)
                metricsL.foreach { m =>
                  m.candidates.add(counters.evaluated)
                  m.blockSkips.add(counters.skips)
                  m.blocksDecoded.add(lists.iterator.map(_.blocks.decodedBlocks.toLong).sum - decodedBefore)
                }
                res.iterator.map { case (docId, score) => (qid, k, docId, score) }
              }
            }
          }
        }
        .toDF("query_id", "k", "doc_id", "score")
    } else {
      // segments are partitioned by (salt, bucket): the bucket IN filter
      // prunes to |query-term buckets| directories per salt, and the term IN
      // predicate pushes into the parquet scan. The broadcast query-term join
      // fans each segment row out to the queries that use its term; grouping
      // by (salt, query) then gives every WAND run its own task slot.
      val qTerms = wandQs.flatMap(q => q.terms.distinct.map(t => (q.queryId, t)))
        .toDF("query_id", "term")
      val segParts = meta.groupBy(_._2._2).toSeq.sortBy(_._1).map { case (ord, ts) =>
        val layer = reader.layers(ord)
        val layerTerms = ts.keys.toSeq
        val buckets = layerTerms.map(graft.index.TermHash.bucket(_, stats.numBuckets)).distinct
        layer.segments
          .filter(col("bucket").isin(buckets: _*))
          .filter(col("term").isin(layerTerms: _*))
          .join(broadcast(qTerms), "term")
          .select(col("salt"), col("query_id"), col("term"), col("df"),
            col("postings"), col("dls"), col("block_max"), col("block_dir"),
            lit(ord).as("layer_ord"), lit(layer.boundScale).as("bound_scale"))
      }
      val segs = segParts.reduce(_ unionByName _)
        .as[(Int, String, String, Long, Array[Byte], Array[Byte], Seq[Double], Array[Byte], Int, Double)]

      segs
        .groupByKey(r => (r._1, r._2))
        .flatMapGroups { (key: (Int, String), rows: Iterator[(Int, String, String, Long, Array[Byte], Array[Byte], Seq[Double], Array[Byte], Int, Double)]) =>
          val (salt, queryId) = key
          val q = qByIdLocal(queryId)
          val lists = rows.map { case (_, _, t, segDf, p, d, bm, dir, ord, scale) =>
            val blocks = PostingCache.open(s"$cacheTag#L$ord", salt, t, segDf, p, d, dir)
            val scaled = if (scale == 1.0) bm.toArray else bm.iterator.map(_ * scale).toArray
            TermList(t, Postings.idf(dfMap(t), n), blocks, scaled)
          }.toSeq
          val decodedBefore = if (metrics.isDefined) lists.iterator.map(_.blocks.decodedBlocks.toLong).sum else 0L
          val counters = new WandCounters
          val res = wandShardTopK(lists, q.k, avgdl, counters, scopeFn)
          metrics.foreach { m =>
            m.candidates.add(counters.evaluated)
            m.blockSkips.add(counters.skips)
            m.blocksDecoded.add(lists.iterator.map(_.blocks.decodedBlocks.toLong).sum - decodedBefore)
          }
          res.map { case (docId, score) => (queryId, q.k, docId, score) }
        }
        .toDF("query_id", "k", "doc_id", "score")
    }

    // Candidate sets are threshold-pruned (≤ k + ε-ties per shard per
    // query; hybrid ≤ FastK + Σ df_rare) — BROADCAST them against the
    // corpus-sized docs sidecar. Without the hint the initial plan is an
    // SMJ whose docs-side hash shuffle (N rows) materializes as an AQE
    // stage on EVERY query before AQE converts the join to broadcast
    // anyway; the hint makes the docs side a plain in-memory columnar
    // scan with no exchange. On a degenerate all-ties corpus the tie set
    // can grow large, but that is exactly the size AQE's runtime stats
    // already chose to broadcast (BuildLeft) on the same input.
    val allCand = (Seq(candidates) ++ nonWand).reduce(_ unionByName _)
    withFast(NaiveSearch.rankByKeysUnsorted(docKeys.join(broadcast(allCand), "doc_id")))
  }

  /** One term's shard sub-postings, accessed block-lazily: the cursor's
    * seeks route through the block directory ([[Postings.PostingsBlocks]]),
    * so skipped blocks are never DECOMPRESSED, not just never scored.
    */
  final case class TermList(
      term: String, idf: Double,
      blocks: Postings.PostingsBlocks, blockMax: Array[Double]) {
    def maxScore: Double = if (blockMax.isEmpty) 0.0 else idf * blockMax.max
    def blockUpper(pos: Int): Double = idf * blockMax(pos / Postings.BlockSize)
  }

  /** Primitive bounded min-heap of the top-k scores seen — replaces the
    * boxed `PriorityQueue[Double]` in the WAND kernels (r6: one boxed
    * Double allocation per evaluated candidate on a hot-term query was
    * measurable at ~600k evaluations/query).
    */
  private[engine] final class ScoreHeap(k: Int) {
    private val a = new Array[Double](math.max(k, 1))
    var size: Int = 0
    def min: Double = a(0)
    def threshold: Double = if (size < k) Double.NegativeInfinity else a(0) - Eps
    def add(v: Double): Unit = {
      if (size < k) {
        a(size) = v; size += 1
        var i = size - 1
        while (i > 0 && a((i - 1) / 2) > a(i)) {
          val t = a(i); a(i) = a((i - 1) / 2); a((i - 1) / 2) = t; i = (i - 1) / 2
        }
      } else if (v > a(0)) {
        a(0) = v
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < size && a(l) < a(m)) m = l
          if (r < size && a(r) < a(m)) m = r
          if (m == i) cont = false
          else { val t = a(i); a(i) = a(m); a(m) = t; i = m }
        }
      }
    }
  }

  /** Single-list block-max top-k — the hot-term shape ([[wandShardTopK]]
    * with one cursor degenerates to exactly this loop, minus its
    * per-iteration cursor sort/filter allocations): walk the list block by
    * block, skip a whole block when its bound cannot reach the heap
    * threshold, otherwise evaluate in place. Identical results to the
    * generic kernel by construction (same threshold, same Eps tie slack,
    * same scope handling); WandSpec pins kernel-vs-brute-force identity.
    */
  private def singleListTopK(
      tl: TermList, k: Int, avgdl: Double,
      counters: WandCounters, inScope: Long => Boolean): Seq[(Long, Double)] = {
    val b = tl.blocks
    val heap = new ScoreHeap(k)
    val evaluated = mutable.ArrayBuffer.empty[(Long, Double)]
    var pos = 0
    while (pos < b.count) {
      val thr = heap.threshold
      if (tl.blockUpper(pos) < thr) {
        // the whole current block is bounded under the threshold — hop to
        // the next block start without decoding (the directory knows it)
        if (counters != null) counters.skips += 1
        pos = (pos / Postings.BlockSize + 1) * Postings.BlockSize
      } else {
        val end = math.min((pos / Postings.BlockSize + 1) * Postings.BlockSize, b.count)
        while (pos < end) {
          val doc = b.id(pos)
          if (inScope(doc)) {
            if (counters != null) counters.evaluated += 1
            val score = tl.idf * Postings.tfNorm(b.tf(pos), b.dl(pos), avgdl)
            if (score >= heap.threshold || heap.size < k) {
              evaluated += ((doc, score))
              heap.add(score)
            }
          }
          pos += 1
        }
      }
    }
    finishTies(evaluated, heap.threshold)
  }

  /** Classic block-max WAND over block-lazy shard sub-postings.
    * Returns every doc whose exact score ≥ (k-th best − [[Eps]]).
    * `counters` (optional) collects evaluated-doc and BMW-skip counts for
    * [[QueryMetrics]].
    */
  def wandShardTopK(
      lists: Seq[TermList], k: Int, avgdl: Double,
      counters: WandCounters = null,
      inScope: Long => Boolean = _ => true): Seq[(Long, Double)] = {
    if (lists.isEmpty || k <= 0) return Nil
    if (lists.size == 1) return singleListTopK(lists.head, k, avgdl, counters, inScope)
    final class Cursor(val tl: TermList) { var pos: Int = 0
      def doc: Long = tl.blocks.id(pos)
      def done: Boolean = pos >= tl.blocks.count
      /** seek to first posting with docId >= target: block-directory search
        * first (no decode), then one in-block binary search
        */
      def seek(target: Long): Unit = pos = tl.blocks.seek(pos, target)
    }
    val cursors = lists.map(new Cursor(_)).toArray
    val heap = new ScoreHeap(k)
    val evaluated = mutable.ArrayBuffer.empty[(Long, Double)]

    def threshold: Double = heap.threshold

    // active-cursor maintenance in place (r6): the loop previously allocated
    // a filterNot array + a sortBy array + boxed comparator calls PER
    // ITERATION — on a 3-term query that was ~1 µs of allocation per
    // advanced posting (q08 task-CPU ~1 s for 5.7k evaluations). `sorted`
    // holds the live cursors in [0, nActive), insertion-sorted by doc —
    // nearly sorted between iterations, so the re-sort is ~n comparisons.
    val sorted = new Array[Cursor](cursors.length)
    var nActive = 0
    cursors.foreach { c => if (!c.done) { sorted(nActive) = c; nActive += 1 } }
    while (nActive > 0) {
      // drop exhausted cursors, then insertion-sort by current doc
      var w = 0
      var r = 0
      while (r < nActive) {
        if (!sorted(r).done) { sorted(w) = sorted(r); w += 1 }
        r += 1
      }
      nActive = w
      if (nActive == 0) return finishTies(evaluated, threshold)
      var si = 1
      while (si < nActive) {
        val c = sorted(si)
        val cd = c.doc
        var sj = si - 1
        while (sj >= 0 && sorted(sj).doc > cd) { sorted(sj + 1) = sorted(sj); sj -= 1 }
        sorted(sj + 1) = c
        si += 1
      }
      // find pivot: smallest prefix whose summed term upper bounds reach threshold
      var acc = 0.0
      var p = -1
      var i = 0
      while (i < nActive && p < 0) {
        acc += sorted(i).tl.maxScore
        if (acc >= threshold) p = i
        i += 1
      }
      if (p < 0) return finishTies(evaluated, threshold)
      val pivotDoc = sorted(p).doc
      if (sorted(0).doc == pivotDoc) {
        // refined bound from the block maxima at the current positions —
        // over EVERY cursor sitting on pivotDoc, not just the pivot prefix
        // (cursors beyond p can share pivotDoc and contribute score)
        var blockUb = 0.0
        var j = 0
        while (j < nActive && (j <= p || sorted(j).doc == pivotDoc)) {
          blockUb += sorted(j).tl.blockUpper(sorted(j).pos); j += 1
        }
        if (blockUb >= threshold) {
          if (inScope(pivotDoc)) {
            if (counters != null) counters.evaluated += 1
            var score = 0.0
            cursors.foreach { c =>
              if (!c.done) {
                if (c.doc < pivotDoc) c.seek(pivotDoc)
                if (!c.done && c.doc == pivotDoc)
                  score += c.tl.idf * Postings.tfNorm(c.tl.blocks.tf(c.pos), c.tl.blocks.dl(c.pos), avgdl)
              }
            }
            if (score >= threshold || heap.size < k) {
              evaluated += ((pivotDoc, score))
              heap.add(score)
            }
          }
          // advance every cursor sitting on pivotDoc (scoped-out docs are
          // skipped WITHOUT scoring — they never enter the heap, so the
          // threshold reflects the scope's own top-k)
          var ai = 0
          while (ai < nActive) {
            val c = sorted(ai)
            if (!c.done && c.doc == pivotDoc) c.pos += 1
            ai += 1
          }
        } else {
          // BMW block skip (Ding & Suel): the per-block bound over the
          // pivot set stays valid until the earliest of (a) some pivot-set
          // cursor crossing its block boundary, (b) the first cursor
          // beyond the set entering the window — so every doc in
          // [pivotDoc, d) is bounded < threshold and the whole window is
          // skipped WITHOUT decompressing its blocks (seek's block
          // directory + first-id fast path).
          if (counters != null) counters.skips += 1
          var d = Long.MaxValue
          var j = 0
          var beyond = -1
          while (j < nActive) {
            val inSet = j <= p || sorted(j).doc == pivotDoc
            if (inSet) {
              val nf = sorted(j).tl.blocks.nextBlockFirstId(sorted(j).pos)
              if (nf < d) d = nf
            } else if (beyond < 0) beyond = j
            j += 1
          }
          if (beyond >= 0 && sorted(beyond).doc < d) d = sorted(beyond).doc
          if (d == Long.MaxValue) {
            // every pivot-set list is in its final block and nothing lies
            // beyond: the bound holds to the end of all lists
            return finishTies(evaluated, threshold)
          }
          j = 0
          while (j < nActive && (j <= p || sorted(j).doc == pivotDoc)) {
            sorted(j).seek(d); j += 1
          }
        }
      } else {
        // advance all cursors before the pivot up to pivotDoc
        var j = 0
        while (j < p) { sorted(j).seek(pivotDoc); j += 1 }
      }
      // termination guard: exhausted cursors are dropped at the loop top
    }
    finishTies(evaluated, threshold)
  }

  private def finishTies(evaluated: mutable.ArrayBuffer[(Long, Double)], thr: Double): Seq[(Long, Double)] =
    if (thr == Double.NegativeInfinity) evaluated.toSeq
    else evaluated.filter(_._2 >= thr).toSeq
}
