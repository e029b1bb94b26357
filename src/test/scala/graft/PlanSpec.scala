package graft

import graft.corpus.Corpus
import graft.queries.QuerySet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4.2: "verify in explain() during
  * bring-up") — the plans the engine relies on at 100 TB must actually be
  * the plans Catalyst picks at test scale:
  *
  *  - query-term filters reach the index parquet scan (PushedFilters) and
  *    the bucket partition column prunes directories (PartitionFilters);
  *  - the tiny query set broadcasts (BroadcastHashJoin), never shuffles
  *    the big tf relation on term at query time;
  *  - the incremental index merge is a SortMergeJoin on term;
  *  - the corpus scan prunes lineitem to only the synthesis columns.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("index cold scan: term filter pushed down + bucket partitions pruned") {
    import org.apache.spark.sql.functions._
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    // the cold-start plan (what a fresh executor scan runs): filters must
    // reach the parquet source
    val cold = spark.read.parquet(paths.indexDir)
      .filter(col("bucket").isin(0, 1, 2))
      .filter(col("term").isin("func", "buffer"))
      .select("term", "df", "postings")
    val p = plan(cold)
    assert(p.contains("PushedFilters") && p.contains("In(term"), s"term filter not pushed:\n$p")
    assert(p.contains("PartitionFilters") && p.contains("bucket"), s"no bucket pruning:\n$p")
  }

  test("index hot path: query runs against the resident cached reader") {
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    val p = plan(graft.engine.IndexSearch.topKAt(spark, paths, QuerySet.df(spark)))
    assert(p.contains("InMemoryTableScan") || p.contains("Scan In-memory"),
      s"hot query path does not use the cached index:\n$p")
  }

  test("naive BM25: query set joins are broadcast, not shuffled") {
    val p = plan(graft.engine.NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), QuerySet.df(spark)))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in naive plan:\n$p")
  }

  test("corpus scan prunes lineitem to synthesis columns only") {
    val p = plan(Corpus.corpus(spark, sfDir))
    // ReadSchema for lineitem must not include e.g. l_extendedprice/l_tax
    assert(!p.contains("l_extendedprice") && !p.contains("l_tax") && !p.contains("l_shipdate"),
      s"lineitem scan reads unused columns:\n$p")
  }

  test("corpus table reads stay declarative: filters pushed, columns pruned") {
    import org.apache.spark.sql.functions._
    // a snapshot read is a plain multi-directory parquet scan — predicates
    // and projections must reach the source exactly as on a bare directory
    // (the snapshot layer adds metadata resolution, never an opaque plan node)
    val root = java.nio.file.Files.createTempDirectory("graft-plan-ct").toString
    graft.corpus.CorpusTable.create(spark,
      Corpus.corpus(spark, sfDir).limit(100), root)
    val q = graft.corpus.CorpusTable.read(spark, root)
      .filter(col("repo") === "repo-1")
      .select("repo", "path")
    val p = plan(q)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(repo"),
      s"repo predicate not pushed through the snapshot read:\n$p")
    assert(!p.contains("content"), s"pruned read still scans content:\n$p")
    graft.corpus.CorpusTable.drop(root)
  }

  test("ranking tails use the bounded top-k aggregate, never a query-id window") {
    // a Window.partitionBy(query_id) funnels each query's whole candidate
    // set through one task; the k-heap aggregate reduces map-side first
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    val plans = Seq(
      plan(graft.engine.NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), QuerySet.df(spark))),
      plan(graft.engine.IndexSearch.topKAt(spark, paths, QuerySet.df(spark))),
      plan(graft.engine.Wand.topKAt(spark, paths, QuerySet.all)),
      plan(graft.ops.Ann.bruteForceTopK(graft.ops.Ann.embeddings(spark, sfDir))),
      // IVF incl. k-means assignment + probe selection (max_by / TopK agg)
      plan(graft.ops.Ann.ivfTopK(graft.ops.Ann.embeddings(spark, sfDir))))
    plans.foreach { p =>
      assert(p.contains("top_k_by_score"), s"ranking tail is not the top-k aggregate:\n$p")
      assert(!p.contains("RunningWindowFunction") && !p.contains("Window ["),
        s"query ranking still uses a window:\n$p")
    }
  }

  test("dedup group labeling is groupBy + join back, never a hash-partitioned window") {
    // Window.partitionBy(text_sha/fingerprint) funnels each duplicate group
    // through ONE task — the pathological input (a mass-duplicated doc) is
    // exactly what dedup targets, so the label join must hash-partition
    val docs = graft.ops.TextOps.documents(spark, sfDir)
    Seq(plan(graft.ops.Dedup.exact(docs)), plan(graft.ops.TextOps.fingerprint(docs))).foreach { p =>
      assert(!p.contains("RunningWindowFunction") && !p.contains("Window ["),
        s"dedup labeling still uses a window:\n$p")
    }
  }

  test("scoped search keeps the top-k aggregate tail and broadcasts only query terms") {
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    val p = plan(graft.engine.Wand.topKAt(spark, paths, QuerySet.all,
      repoScope = Some(QuerySet.scopeRepos)))
    assert(p.contains("top_k_by_score"), s"scoped tail lost the top-k aggregate:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window ["),
      s"scoped ranking uses a window:\n$p")
  }

  test("LSH dedup verify joins candidates to shingles (no corpus-wide self-join recompute)") {
    // the verify stage must hash-join the candidate pair list against the
    // per-doc shingle sets; a second full shingle⋈shingle self-join would
    // show up as a join keyed on shingle alone upstream of the jaccard agg
    val docs = graft.ops.TextOps.documents(spark, sfDir)
    val p = plan(graft.ops.Dedup.minhashLshPairs(docs))
    // a global shingle self-join appears in explain as an equi-join keyed on
    // shingle ALONE ("keys [1]: [shingle#..]"); the LSH path's joins are the
    // band-bucket join ([band, key]) and the verify joins ([ida] / [idb,
    // shingle]) — none single-keyed on shingle
    assert(!p.contains("keys [1]: [shingle"),
      s"LSH verify recomputes the global shingle self-join:\n$p")
  }

  test("serve ranking tail: candidates broadcast against docs, single-partition sort") {
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    graft.engine.Wand.ForceWandRoute = true
    try {
      val p = plan(graft.engine.Wand.topKAt(spark, paths, QuerySet.all))
      // candidate sets are k + ε-ties bounded → they must be the broadcast
      // side; without the hint the initial plan shuffles the corpus-sized
      // docs sidecar on doc_id for an SMJ on EVERY query
      assert(!p.contains("SortMergeJoin"), s"serve tail plans an SMJ against docs:\n$p")
      // ≤ Σk output rows: a range-partitioned orderBy would run a sampling
      // job + exchange per query for nothing
      assert(!p.contains("rangepartitioning"), s"serve tail range-partitions its sort:\n$p")
      assert(p.contains("Coalesce"), s"serve tail lost the single-partition sort:\n$p")
    } finally graft.engine.Wand.ForceWandRoute = false
  }

  test("incremental merge is a SortMergeJoin (full_outer on term)") {
    // build tiny base + delta through the public path and inspect the plan
    // indirectly: hint("merge") + full_outer on 1-row-per-term sides must
    // select SortMergeJoin in the executed plan.
    val existing = spark.range(0, 1000).selectExpr("concat('t', id) AS term", "encode(concat('p', id), 'UTF-8') AS postings_a", "encode(concat('d', id), 'UTF-8') AS dls_a")
    val delta = spark.range(500, 1500).selectExpr("concat('t', id) AS term", "encode(concat('p', id), 'UTF-8') AS postings_b", "encode(concat('d', id), 'UTF-8') AS dls_b")
    val joined = existing.hint("merge").join(delta, Seq("term"), "full_outer")
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), s"merge hint did not yield SMJ:\n$p")
  }

  test("stored graph traversal scans the edges artifact, never the corpus source") {
    val (paths, _) = graft.index.IndexBuilder.ensure(spark, sfDir)
    val e = graft.index.LinkIndex.readMergedEdges(spark, paths.root)
    val pe = plan(e)
    assert(pe.contains("/edges"), s"edges read does not scan the stored artifact:\n$pe")
    assert(!pe.contains("lineitem"), "stored edges must not derive from the corpus source")
    // the traversal itself must never touch the synthesis source: nodes come
    // from the docs sidecar, edges from the stored relation (the v6 shape
    // re-tokenized the corpus per invocation)
    val out = graft.ops.Graph.reachStored(spark, paths.root)
    val po = plan(out)
    assert(!po.contains("lineitem"), s"stored traversal re-derives from the corpus source:\n$po")
    assert(out.count() > 0, "stored traversal returned no rows")
  }
}
