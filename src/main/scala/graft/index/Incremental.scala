package graft.index

import graft.corpus.Corpus
import graft.tokenize.Tokenizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Incremental index maintenance — SURVEY.md §2.4 J1 + J2, the engine
  * analog of the reference's conditional upserts:
  *
  *  - J1 `FindOrCreateNode` (`pkg/database/relationship/dgraph.go:95-127`,
  *    insert iff absent) → `left_anti` join of the incoming batch against
  *    the already-indexed docIds: only genuinely new docs produce postings;
  *  - J2 `CheckOrCreatePredicate` (`dgraph.go:148-176`, merge edge into
  *    existing edge list) → a Catalyst-planned **sort-merge full_outer
  *    join** on `term` (`hint("merge")`) — but ONLY between the delta's
  *    terms and the base rows for those same terms (left_semi-restricted).
  *
  * Delta layout (LSM-style, the 100 TB shape): untouched base terms are
  * REFERENCED through the snapshot metadata ([[Snapshots]]), never decoded,
  * re-encoded, or rewritten — a 0.1% delta costs a delta-sized write, not a
  * full-index rewrite. The output root holds only the merged delta-term
  * rows + the fresh docs sidecar + a snapshot whose layer list is
  * `base layers ++ [delta]`; readers resolve newest-wins per term
  * ([[readMergedIndex]]) and union per doc ([[readMergedDocs]]).
  *
  * Stats semantics: nDocs/avgdl count TOKEN-BEARING docs only, matching
  * [[IndexBuilder]] (zero-token docs get a lineage row with dl=0 but no
  * postings — P7). Delta terms are re-encoded with the NEW avgdl, so their
  * block-max bounds are exact, and the delta layer also gets SALTED
  * SEGMENTS (same doc-salt function as the base build), so a layered root
  * is directly WAND-servable at full (salt × query) parallelism. Untouched
  * base terms keep block-max computed at the base avgdl; since the BM25
  * tf-normalization is monotone increasing in avgdl, the layered WAND
  * reader ([[graft.engine.Wand]]) scales base-layer bounds with
  * `max(1, avgdl_new / avgdl_base)` — an upper bound because
  * tfNorm(tf,dl,a')/tfNorm(tf,dl,a) ≤ a'/a for a' > a (the ratio is
  * (C + X/a)/(C + X/a') with C = tf + k1(1−b) ≥ 0, maximized at C = 0).
  * [[compact]] folds the layers back to one exact-bounds layer.
  */
object Incremental {

  /** Add `newCorpus` (which may overlap the already-indexed corpus) into
    * the index at `basePaths`, writing ONLY the delta layer to `outPaths`
    * and publishing a layered snapshot there. Returns the new stats.
    * Idempotent: replaying the same batch yields an identical delta (J1
    * filters previously-indexed docIds, including dl=0 lineage rows).
    */
  def addBatch(
      spark: SparkSession,
      basePaths: IndexPaths,
      newCorpus: DataFrame,
      outPaths: IndexPaths): IndexStats = {
    def phase[A](name: String)(f: => A): A = IndexBuilder.phase(name, tag = "add")(f)
    // a snapshot is only ever published on completion, so its presence is
    // the completeness watermark for layered roots (delta outputs have no
    // salt manifests of their own); legacy single-layer roots fall back to
    // the strict manifest-counting open().
    val baseLayers = Snapshots.read(basePaths.root).getOrElse {
      IndexBuilder.open(basePaths)
      Snapshot(1, Seq(basePaths.indexDir), Seq(basePaths.docsDir),
        Seq(basePaths.segmentsDir), Seq(basePaths.statsPath), basePaths.statsPath, None)
    }
    // fail fast on a pre-v4 or malformed base BEFORE any expensive phase:
    // a snapshot without aligned per-layer segments/stats would merge fine
    // but publish a root no reader can ever open
    if (baseLayers.segmentsDirs.size != baseLayers.indexDirs.size ||
        baseLayers.statsPaths.size != baseLayers.indexDirs.size)
      throw new IllegalStateException(
        s"addBatch: base snapshot v${baseLayers.version} at ${basePaths.root} lacks aligned " +
          s"per-layer segments/stats (pre-v${IndexBuilder.FormatVersion} metadata?) — rebuild the base")
    val baseStats = IndexBuilder.readStatsFile(baseLayers.statsPath).getOrElse(
      throw new IllegalStateException(s"missing stats at ${baseLayers.statsPath}"))
    if (baseStats.version != IndexBuilder.FormatVersion)
      throw new IllegalStateException(
        s"addBatch: base at ${basePaths.root} has format v${baseStats.version}, " +
          s"need v${IndexBuilder.FormatVersion} — rebuild the base")

    val baseDocs = baseLayers.docsDirs
      .map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
      .reduce(_ unionByName _)
    val existingIds = baseDocs.select("doc_id")
    val incoming = Corpus.withDocId(newCorpus)
    // J1: insert iff absent — idempotent replays, like the reference's
    // @if(eq(len(page),0)) upsert guard. Includes dl=0 lineage rows, so a
    // dead doc admitted once is never re-admitted on replay.
    val fresh = incoming.join(existingIds, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val tf = Tokenizer.termFreqsWithDl(fresh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.select(col("doc_id"), col("dl")).distinct()

    // new global stats over old ∪ fresh TOKEN-BEARING doc lengths — the
    // docs sidecar also holds dl=0 lineage rows, which IndexBuilder's
    // dl-derived stats never count (DeadDocSpec pins that invariant).
    val oldDls = baseDocs.select(col("doc_id"), col("dl")).filter(col("dl") > 0)
    val allDls = oldDls.union(dl)
    val sRow = phase("stats")(
      allDls.agg(count(lit(1)), avg(col("dl").cast("double")), sum("dl")).head())
    val newStats = IndexStats(IndexBuilder.FormatVersion, sRow.getLong(0), sRow.getDouble(1),
      sRow.getLong(2), baseStats.numSalts, baseStats.numBuckets)

    // Replay no-op detection (r6, VERDICT r5 #8): an addBatch is a pure
    // replay iff the published snapshot at the out root already records this
    // exact (base layers, resulting stats, fresh-set fingerprint) triple and
    // every delta artifact is published — then every phase below rewrites
    // byte-equivalent content (all derivations are deterministic in the
    // fresh set + base), so the whole rewrite is skipped and only the
    // snapshot/stats publish runs (same end state, version bumped exactly as
    // before). The fingerprint is order-independent (count + XOR of a
    // full-row hash) and stored in the stats build_args at publish time;
    // stats alone are NOT sufficient (two different batches could collide on
    // (nDocs, avgdl, totalTokens)). `index_incremental`'s replay=true entry
    // — the J1 idempotency exercise Verify pays every run — goes from a full
    // delta rewrite to anti-join + stats + fingerprint.
    // \u0001 field separator in the row hash: a separator-less concat
    // would let field-boundary shifts alias (("ab","c") vs ("a","bc")).
    val fpRow = fresh
      .select(xxhash64(concat_ws("\u0001",
        col("repo"), col("path"), col("commit"), col("lang"), col("content"))).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    val freshFp = s"${fpRow.getLong(0)}:${if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1)}"
    val publishArgs = s"incremental over ${basePaths.root} fp=$freshFp"
    // In-flight rewrite marker: an addBatch of a DIFFERENT batch that
    // crashed mid-rewrite leaves artifacts (e.g. an overwritten delta
    // index) that no longer correspond to the still-published stats and
    // snapshot — the _SUCCESS checks below validate artifact PRESENCE, not
    // correspondence. The marker is written before the first rewrite phase
    // and removed only after the snapshot publish, so the no-op is taken
    // only when no rewrite was interrupted in between (the full rewrite is
    // the self-healing path).
    val inflightMarker = java.nio.file.Paths.get(s"${outPaths.root}/add-inflight.json")
    val replayNoOp = !java.nio.file.Files.exists(inflightMarker) &&
      Snapshots.read(outPaths.root).exists { prev =>
      prev.indexDirs == (baseLayers.indexDirs :+ outPaths.indexDir) &&
        prev.docsDirs == (baseLayers.docsDirs :+ outPaths.docsDir) &&
        prev.segmentsDirs == (baseLayers.segmentsDirs :+ outPaths.segmentsDir) &&
        IndexBuilder.readStatsFile(prev.statsPath).contains(newStats) &&
        IndexBuilder.readJsonString(
          java.nio.file.Paths.get(prev.statsPath), "build_args").contains(publishArgs)
    } && Seq(outPaths.indexDir, outPaths.segmentsDir, outPaths.docsDir,
      outPaths.edgesDir, outPaths.fastDir)
      .forall(d => java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_SUCCESS")))
    if (replayNoOp) {
      System.err.println(s"[add] replay no-op: ${outPaths.root} already carries this batch ($publishArgs)")
      fresh.unpersist(); tf.unpersist()
    } else {
      java.nio.file.Files.createDirectories(inflightMarker.getParent)
      java.nio.file.Files.writeString(inflightMarker, "in-flight: " + publishArgs)
      addBatchRewrite(spark, baseLayers, basePaths, outPaths, fresh, tf, newStats)
    }

    // persist stats + the layered snapshot: the merged table is openable
    // from outPaths alone.
    IndexBuilder.writeStatsJson(outPaths.statsPath, newStats, publishArgs)
    // version = strictly AFTER both the base chain and anything already
    // published at the out root: republishing (e.g. replaying an add onto a
    // root that was since compacted) must never move the hint BACKWARDS to
    // an older view
    val outVersion = math.max(baseLayers.version,
      Snapshots.currentVersion(outPaths.root).getOrElse(0)) + 1
    Snapshots.write(outPaths.root, Snapshot(
      outVersion,
      baseLayers.indexDirs :+ outPaths.indexDir,
      baseLayers.docsDirs :+ outPaths.docsDir,
      baseLayers.segmentsDirs :+ outPaths.segmentsDir,
      baseLayers.statsPaths :+ outPaths.statsPath,
      outPaths.statsPath,
      Some(basePaths.root)))
    // a new snapshot invalidates any resident reader on this root
    graft.engine.IndexReader.invalidate(outPaths.root)
    // rewrite (if any) and publish both landed — clear the in-flight marker
    java.nio.file.Files.deleteIfExists(inflightMarker)
    newStats
  }

  /** The rewrite half of [[addBatch]] — delta postings, salted delta
    * segments, docs/edges delta layers, and the fast-sidecar re-rank.
    * Skipped entirely on a detected replay no-op.
    */
  private def addBatchRewrite(
      spark: SparkSession,
      baseLayers: Snapshot,
      basePaths: IndexPaths,
      outPaths: IndexPaths,
      fresh: DataFrame,
      tf: DataFrame,
      newStats: IndexStats): Unit = {
    def phase[A](name: String)(f: => A): A = IndexBuilder.phase(name, tag = "add")(f)
    // delta postings per term (small batch → single-level aggregation)
    val delta = tf
      .groupBy("term")
      .agg(PostingAggExprs.buildPostings(newStats.avgdl, col("doc_id"), col("tf"), col("dl")).as("p"))
      .select(col("term"), col("p.postings").as("postings_b"), col("p.dls").as("dls_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // base rows for DELTA TERMS ONLY: newest layer wins per term, then the
    // left_semi restriction keeps untouched terms out of the merge entirely.
    val baseCurrent = currentIndex(spark, baseLayers)
    val existing = baseCurrent
      .join(delta.select("term"), Seq("term"), "left_semi")
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
        (term, e.df, e.sumTf, e.postings, e.dls, e.blockMax, e.blockDir)
      }
      .toDF("term", "df", "sum_tf", "postings", "dls", "block_max", "block_dir")
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(newStats.numBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    phase("merge+index-write")(out.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outPaths.indexDir))

    // Salted delta-layer SEGMENTS — what makes the layered root servable by
    // the sharded WAND at full (salt × query) parallelism: the merged
    // per-term lists (base ∪ delta for delta terms) are re-salted with the
    // SAME doc-salt function as the base build, so a given doc lands in the
    // same salt shard in every layer and shards stay docId-disjoint.
    // Split + encode happen INSIDE one flatMap (a stable partition of a
    // sorted list by salt keeps each sub-list sorted): no exploded
    // (term, doc)-row shuffle, no re-aggregation — the only exchange is the
    // (salt, bucket) repartition that co-locates output files.
    val numSalts = newStats.numSalts
    phase("segments-write")(out.select("term", "postings", "dls")
      .as[(String, Array[Byte], Array[Byte])]
      .flatMap { case (term, p, d) =>
        val (ids, tfs, ls) = Postings.decode(p, d)
        val salts = Array.tabulate(ids.length)(i => TermHash.salt(ids(i), numSalts))
        (0 until numSalts).iterator.flatMap { s =>
          val n = { var c = 0; var i = 0; while (i < salts.length) { if (salts(i) == s) c += 1; i += 1 }; c }
          if (n == 0) Iterator.empty
          else {
            val si = new Array[Long](n); val st = new Array[Int](n); val sl = new Array[Long](n)
            var i = 0; var o = 0
            while (i < salts.length) {
              if (salts(i) == s) { si(o) = ids(i); st(o) = tfs(i); sl(o) = ls(i); o += 1 }
              i += 1
            }
            val e = Postings.encode(term, si, st, sl, avgdl)
            Iterator.single((s, term, e.df, e.sumTf, e.postings, e.dls, e.blockMax, e.blockDir))
          }
        }
      }
      .toDF("salt", "term", "df", "sum_tf", "postings", "dls", "block_max", "block_dir")
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(newStats.numBuckets)).cast("int"))
      .repartition(col("salt"), col("bucket"))
      .write.mode("overwrite").partitionBy("salt", "bucket").parquet(outPaths.segmentsDir))

    // docs delta: fresh docs ONLY (base sidecar is referenced, not copied).
    // LEFT join: zero-token fresh docs keep their dl=0 lineage row — same
    // invariant as IndexBuilder's sidecar write (P7). batch_id stamps the
    // layer's ingest lineage (per-doc provenance, the reference's StartUrl
    // analog page.go:83) — deterministic per (base, out) pair, so a
    // replayed batch reproduces the identical sidecar.
    val batchId = s"add:${basePaths.root}->${outPaths.root}"
    val dl = tf.select(col("doc_id"), col("dl")).distinct()
    phase("docs-write")(fresh.join(dl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("repo"), col("path"), col("commit"), col("lang"),
        coalesce(col("dl"), lit(0L)).as("dl"), sha2(col("content"), 256).as("content_sha"),
        lit(batchId).as("batch_id"),
        LinkIndex.custCol(col("content")).as("cust"))
      .write.mode("overwrite").parquet(outPaths.docsDir))

    // Stored link graph, delta layer (v7): fresh docs' edges + re-derived
    // edges for existing docs whose target's canonical provider this batch
    // changed — readers resolve newest-wins per src_id, exactly like the
    // postings' newest-wins per term. A batch that adds nothing writes a
    // valid EMPTY layer (schema-pinned read).
    phase("edges-write") {
      val baseNodes = LinkIndex.nodesOf(baseLayers.docsDirs
        .map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
        .reduce(_ unionByName _))
      val freshNodes = LinkIndex.nodesOf(
        spark.read.schema(IndexBuilder.DocsSchema).parquet(outPaths.docsDir))
      LinkIndex.writeEdges(spark,
        LinkIndex.deltaEdges(baseNodes, freshNodes), outPaths.edgesDir)
    }

    fresh.unpersist(); tf.unpersist(); delta.unpersist(); out.unpersist()

    // v7: rebuild the impact-ordered fast sidecar for the LAYERED root at
    // the NEW avgdl — whole-sidecar, not delta-touched-terms-only, because
    // tfNorm ORDER is not avgdl-stable: every hot term's prefix ranking
    // moves when avgdl moves, not just the terms this batch touched. Hot
    // terms are few by definition (df ≥ FastMinDf), so the re-rank is the
    // same small decode+TopK pass the full build pays (~5% of build wall).
    // Without this, hot single-term queries between an addBatch and the
    // next compact fell back to full WAND at O(df≈N) with no block skips —
    // the exact pathology the fast lists exist to kill, in what is the
    // steady state at 100 TB.
    val layeredView = Snapshot(
      0, baseLayers.indexDirs :+ outPaths.indexDir,
      baseLayers.docsDirs :+ outPaths.docsDir,
      baseLayers.segmentsDirs :+ outPaths.segmentsDir,
      baseLayers.statsPaths :+ outPaths.statsPath,
      outPaths.statsPath, None)
    // Staged swap, NOT an in-place rebuild: on a non-no-op replay (same
    // batch path, changed content) the live snapshot's newest layer
    // references THIS fastDir, so deleting it for the duration of the
    // rebuild would leave the published root without its sidecar for the
    // whole decode+TopK pass (and a crash inside would make that permanent
    // until the next publish). Build beside it, then two renames: the
    // no-sidecar window shrinks to the rename itself, and a crash inside
    // that window degrades to the fast-route-off fallback ([[IndexReader]]
    // fastFor: no _SUCCESS → WAND route — never a stale order), self-healed
    // by the next add/compact.
    val fastFinal = java.nio.file.Paths.get(outPaths.fastDir)
    val fastStage = java.nio.file.Paths.get(outPaths.fastDir + ".next")
    IndexBuilder.deleteRecursively(fastStage)
    // bound scale for the pruned selection: currentIndex rows may come
    // from any base layer, whose block maxima were encoded at that
    // layer's avgdl — the max per-layer `avgdl_new / avgdl_layer` ratio
    // upper-bounds every row's scale (delta-layer rows are encoded at
    // newStats.avgdl, scale 1); same soundness argument as the WAND
    // reader's boundScale
    val fastBoundScale = (1.0 +: baseLayers.statsPaths.flatMap(p =>
      IndexBuilder.readStatsFile(p).map(ls => newStats.avgdl / ls.avgdl))).max
    IndexBuilder.buildFastSidecar(
      spark, currentIndex(spark, layeredView),
      layeredView.docsDirs.map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
        .reduce(_ unionByName _),
      newStats, fastStage.toString, boundScale = fastBoundScale)
    IndexBuilder.deleteRecursively(fastFinal)
    java.nio.file.Files.move(fastStage, fastFinal,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** [[addBatch]] + automatic LSM housekeeping: when the resulting snapshot
    * exceeds `maxLayers`, fold it back to one layer in place
    * ([[compact]]) — queries never pay more than `maxLayers`-deep
    * newest-wins resolution, the unbounded-chain failure mode of an
    * append-only LSM. The compaction is crash-safe (snapshot-last: an
    * interrupted compact leaves the previous version serving).
    */
  def addBatchCompacting(
      spark: SparkSession,
      basePaths: IndexPaths,
      newCorpus: DataFrame,
      outPaths: IndexPaths,
      maxLayers: Int = 8): IndexStats = {
    val stats = addBatch(spark, basePaths, newCorpus, outPaths)
    val snap = Snapshots.read(outPaths.root).get
    if (snap.indexDirs.size > maxLayers) compact(spark, outPaths.root)
    stats
  }

  /** Compaction — fold a layered snapshot back to ONE layer, re-encoded at
    * the CURRENT avgdl so WAND block-max bounds are exact again and queries
    * stop paying per-layer newest-wins resolution (the LSM compaction the
    * layered design promises; reference analog: Dgraph's periodic LSM
    * compaction behind the live store, `pkg/database/relationship/dgraph.go`).
    *
    * Reads the newest-wins merged view, rebuilds salted segments + global
    * index + manifests through the SAME phases as a from-scratch build
    * ([[IndexBuilder.buildPostingsPhases]]), writes the docs union, and
    * publishes a single-layer snapshot. With `toRoot = None` the snapshot is
    * published in place at `root` (version+1, data under
    * `root/compact-v<N>/`); old layer files become unreferenced (kept on
    * disk — time travel / concurrent readers, Iceberg-style). With
    * `toRoot = Some(r)` the compacted table is published as a NEW v1 root.
    */
  def compact(spark: SparkSession, root: String, toRoot: Option[String] = None): IndexStats = {
    val snap = Snapshots.read(root).getOrElse(
      throw new IllegalStateException(s"compact: no snapshot metadata at $root"))
    val stats = IndexBuilder.readStatsFile(snap.statsPath).getOrElse(
      throw new IllegalStateException(s"compact: missing stats at ${snap.statsPath}"))
    // fail fast BEFORE deleting dirs or publishing (mirrors addBatch): a
    // pre-v4 root would otherwise compact into a snapshot whose stats still
    // carry the legacy version — published, then rejected by every reader
    if (snap.segmentsDirs.size != snap.indexDirs.size ||
        snap.statsPaths.size != snap.indexDirs.size)
      throw new IllegalStateException(
        s"compact: snapshot v${snap.version} at $root lacks aligned per-layer segments/stats " +
          s"(pre-v${IndexBuilder.FormatVersion} metadata?) — rebuild the root")
    if (stats.version != IndexBuilder.FormatVersion)
      throw new IllegalStateException(
        s"compact: root $root has format v${stats.version}, " +
          s"need v${IndexBuilder.FormatVersion} — rebuild the root")

    val (inner, publishRoot, publishVersion) = toRoot match {
      case Some(r) => (IndexPaths(r), r, 1)
      case None => (IndexPaths(s"$root/compact-v${snap.version + 1}"), root, snap.version + 1)
    }
    Seq(inner.indexDir, inner.segmentsDir, inner.docsDir, inner.manifestsDir, inner.edgesDir)
      .foreach(d => IndexBuilder.deleteRecursively(java.nio.file.Paths.get(d)))

    // docs union: per-layer docId sets are disjoint (J1), content_sha,
    // cust, and dl=0 lineage rows carry over unchanged.
    snap.docsDirs.map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(inner.docsDir)

    // edges fold back to ONE exact layer, like everything else compaction
    // touches (re-derived whole from the compacted sidecar — a metadata job)
    LinkIndex.writeEdges(spark,
      LinkIndex.edgesOf(LinkIndex.nodesOf(
        spark.read.schema(IndexBuilder.DocsSchema).parquet(inner.docsDir))),
      inner.edgesDir)

    // (doc_id, term, tf, dl) relation from the newest-wins merged index —
    // decode is distributed (one task per index row group), then the shared
    // salted-segments + merge phases re-encode everything at stats.avgdl.
    import spark.implicits._
    val tfd = currentIndex(spark, snap)
      .select("term", "postings", "dls")
      .as[(String, Array[Byte], Array[Byte])]
      .flatMap { case (term, p, d) =>
        val (ids, tfs, ls) = Postings.decode(p, d)
        Iterator.range(0, ids.length).map(i => (ids(i), term, tfs(i).toLong, ls(i)))
      }
      .toDF("doc_id", "term", "tf", "dl")
    IndexBuilder.buildPostingsPhases(spark, tfd, stats, inner, s"compact v$publishVersion of $root")

    // record the SOURCE's identity (its build_args carries the batch
    // fingerprint for incremental roots) so fixture-reuse guards can check
    // "compacted from THIS source content", not merely stats equality —
    // stats alone can collide across different contents (same insufficiency
    // the addBatch replay fingerprint closes)
    val srcArgs = IndexBuilder.readJsonString(
      java.nio.file.Paths.get(snap.statsPath), "build_args").getOrElse("")
    IndexBuilder.writeStatsJson(inner.statsPath, stats,
      s"compact v$publishVersion of $root src=[$srcArgs]")
    Snapshots.write(publishRoot, Snapshot(
      publishVersion, Seq(inner.indexDir), Seq(inner.docsDir), Seq(inner.segmentsDir),
      Seq(inner.statsPath), inner.statsPath, snap.parentRoot))
    graft.engine.IndexReader.invalidate(publishRoot)
    stats
  }

  /** Newest-wins-per-term view over a snapshot's index layers. Schema is
    * pinned explicitly: an empty delta layer (replayed batch) has no
    * parquet files to infer from.
    */
  private def currentIndex(spark: SparkSession, snap: Snapshot): DataFrame =
    snap.indexDirs.map(d => spark.read.schema(IndexBuilder.IndexSchema).parquet(d))
      .reduceRight((older, newer) => // keep newer's row for shared terms
        older.join(newer.select("term"), Seq("term"), "left_anti").unionByName(newer))

  /** The logical merged index at `root` (term, df, sum_tf, postings, dls,
    * block_max, bucket): newest layer wins per term. Untouched base FILES
    * are read as-is — never rewritten by [[addBatch]].
    */
  def readMergedIndex(spark: SparkSession, root: String): DataFrame = {
    val snap = Snapshots.read(root).getOrElse(
      throw new IllegalStateException(s"no snapshot metadata at $root"))
    currentIndex(spark, snap)
  }

  /** The logical docs sidecar at `root`: union of disjoint per-layer docs. */
  def readMergedDocs(spark: SparkSession, root: String): DataFrame = {
    val snap = Snapshots.read(root).getOrElse(
      throw new IllegalStateException(s"no snapshot metadata at $root"))
    snap.docsDirs.map(d => spark.read.schema(IndexBuilder.DocsSchema).parquet(d))
      .reduce(_ unionByName _)
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
