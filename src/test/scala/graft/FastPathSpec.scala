package graft

import graft.engine.{IndexReader, NaiveSearch, QueryMetrics, Wand}
import graft.index.{IndexBuilder, Postings}
import graft.model.Query
import graft.queries.QuerySet
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The v6 impact-ordered fast path: hot single-term queries serve from the
  * per-term top-FastK prefix in O(k) — the fix for the bench finding that
  * block-max pruning never fires on a flat score distribution (q01 "func"
  * evaluated every candidate with 0 skips). Pins: prefix existence +
  * boundary-tie capture, rank identity vs the naive oracle plan with the
  * fast route ENGAGED (candidate counter = prefix size, not df), and the
  * fallbacks (rare term, absent term, k > FastK, scoped query).
  */
class FastPathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var paths: graft.index.IndexPaths = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    paths = IndexBuilder.ensure(spark, sfDir)._1
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hot term has an impact-ordered prefix; rare/absent terms do not") {
    val reader = IndexReader.get(spark, paths)
    val fl = reader.fastList("func")
    assert(fl.isDefined, "hot term 'func' (df = N) must have a fast list")
    val f = fl.get
    assert(f.df >= IndexBuilder.FastMinDf)
    assert(f.ids.length === math.min(IndexBuilder.FastK.toLong, f.df).toInt,
      s"prefix must be exactly min(FastK, df) entries, got ${f.ids.length}")
    assert(f.ids.length == f.tfs.length && f.ids.length == f.dls.length)
    // v7: natural doc keys ride along so serving needs no docs join
    assert(f.ids.length == f.repos.length && f.ids.length == f.paths.length &&
      f.ids.length == f.commits.length)
    assert(reader.fastList("handler_0_3").isEmpty, "rare term must fall back")
    assert(reader.fastList("zzznotfound").isEmpty, "absent term must fall back")
  }

  test("prefix IS the final ranking's head: stored order == naive top-k order") {
    // tie-dominated case: quantized hot-term scores collapse to a few
    // values, so the top-k is decided by natural keys — the prefix must be
    // selected and ordered by the SAME total order as the final ranking
    val reader = IndexReader.get(spark, paths)
    val ids = reader.fastList("func").get.ids
    val docs = spark.read.schema(IndexBuilder.DocsSchema).parquet(paths.docsDir)
      .select("doc_id", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    val prefixKeys = ids.take(10).map(docs)
    val naiveKeys = NaiveSearch.topK(spark,
      graft.corpus.Corpus.corpus(spark, sfDir),
      QuerySet.df(spark).filter(org.apache.spark.sql.functions.col("query_id") === "q01"))
      .collect().map(r => (r.getString(2), r.getString(3), r.getString(4)))
    assert(prefixKeys.toSeq === naiveKeys.toSeq,
      "fast-list head diverged from the oracle plan's top-k order")
  }

  test("fast route engaged: q01 candidate count is k, not df") {
    val reader = IndexReader.get(spark, paths)
    val m = QueryMetrics(spark)
    Wand.topKAt(spark, paths, Seq(Query("q01", Seq("func"), 10)), Some(m)).count()
    // v7 serves take(k) of the driver-resident prefix: the served candidate
    // set is exactly k rows, nowhere near df
    assert(m.candidates.value === 10L,
      s"fast path not engaged: evaluated ${m.candidates.value}, expected k=10")
    assert(m.candidates.value < reader.fastList("func").get.df,
      "candidate count should be far below df")
  }

  test("fast single-term queries are answered with ZERO Spark jobs") {
    // only "func" clears FastMinDf at sf0.001 (~6k docs) — the batch mixes
    // two fast-single queries (different k) with an absent term (also
    // driver-answerable: empty)
    val qs = Seq(Query("z1", Seq("func"), 10), Query("z2", Seq("func"), 5),
      Query("z3", Seq("zzznotfound"), 10))
    // warm the driver caches (termMeta + fastList probes are one-time jobs)
    Wand.topKAt(spark, paths, qs.map(q => q.copy(queryId = q.queryId + "w"))).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      val rows = Wand.topKAt(spark, paths, qs).collect()
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      assert(rows.length === 15, "10 + 5 + 0 rows expected")
      assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ===
        rows.map(r => (r.getString(0), r.getInt(1))).toSeq.sorted,
        "driver-local result must come out (query_id, rank)-sorted")
      assert(jobs.get === 0,
        s"fast single-term serving scheduled ${jobs.get} Spark jobs; v7 contract is 0")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("batched prefetch settles the fast-list cache: per-term probes run zero jobs after it") {
    // a cold batch with T distinct hot terms must pay ONE probe job, not T:
    // prefetchFastLists covers all missing terms in one bucket-pruned scan,
    // and termMeta-known-rare terms are cached as absent without any job
    IndexReader.invalidate(paths.root)
    val reader = IndexReader.get(spark, paths)
    val terms = Seq("func", "handler_0_3", "zzznotfound")
    reader.termMeta(terms) // settle dfs (separate one-time jobs)
    reader.prefetchFastLists(terms)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(l)
    try {
      assert(reader.fastList("func").isDefined)
      assert(reader.fastList("handler_0_3").isEmpty)
      assert(reader.fastList("zzznotfound").isEmpty)
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get === 0,
        s"fastList after prefetch scheduled ${jobs.get} jobs; the batch probe must cover all terms")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("serving path (fast + WAND mix) is rank-identical to the naive oracle plan") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
    val got = Wand.topKAt(spark, paths, QuerySet.all).collect().map(key).toSeq
    val want = NaiveSearch.topK(spark,
      graft.corpus.Corpus.corpus(spark, sfDir), QuerySet.df(spark)).collect().map(key).toSeq
    assert(got === want, "fast-path-mixed serving diverged from the oracle plan")
  }

  test("hybrid hot+rare query serves from prefix ∪ rare lists, not O(N)") {
    // the classic "rare identifier + common keyword" shape (q06): exactly
    // one fast-listed term → candidates = prefix(hot) ∪ full(rare); any
    // other doc is hot-only outside the prefix and dominated by all FastK
    // prefix docs in the final total order
    val reader = IndexReader.get(spark, paths)
    val q = Query("hyb", Seq("func", "handler_0_3"), 10)
    val m = QueryMetrics(spark)
    val got = Wand.topKAt(spark, paths, Seq(q), Some(m)).collect()
    val hotDf = reader.fastList("func").get.df
    assert(m.candidates.value > 0L && m.candidates.value < hotDf / 2,
      s"hybrid path not engaged: evaluated ${m.candidates.value} of df=$hotDf")
    // rank-identical to the naive oracle plan on the same query
    val s = spark; import s.implicits._
    val want = NaiveSearch.topK(spark, graft.corpus.Corpus.corpus(spark, sfDir),
      Seq(("hyb", "func", 10), ("hyb", "handler_0_3", 10)).toDF("query_id", "term", "k")).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
    assert(got.map(key).toSeq === want.map(key).toSeq)
    // duplicate terms collapse before routing (still the single-term path)
    val dup = Wand.topKAt(spark, paths, Seq(Query("mm", Seq("func", "func"), 5))).collect()
    assert(dup.map(_.getInt(1)).toSeq === (1 to 5))
  }

  test("hybrid cap: many-rare-term query exceeds the driver-collect bound, falls back to WAND") {
    val reader = IndexReader.get(spark, paths)
    val rare = (0 until 14).map(i => s"cust_$i")
    val dfs = reader.dfOf(rare)
    val q = Query("cap", "func" +: rare, 10)
    // at sf0.001 no realistic query reaches 32 k rare postings — lower the
    // cap below the fixture's Σ df_rare to exercise the guard, restore after
    val prev = Wand.HybridMaxRarePostings
    Wand.HybridMaxRarePostings = dfs.values.sum - 1
    try {
      val m = QueryMetrics(spark)
      val got = Wand.topKAt(spark, paths, Seq(q), Some(m)).collect()
      // the route counters are driver-exact: the over-cap query must have
      // been refused by the hybrid partition and WAND-routed (candidate
      // counts can't discriminate — BMW pruning can make WAND evaluate
      // FEWER docs than the hybrid union holds)
      assert(m.routedWand.value === 1L && m.routedHybrid.value === 0L,
        s"expected WAND fallback, routes = ${m.snapshot}")
      val s2 = spark; import s2.implicits._
      val want = NaiveSearch.topK(spark, graft.corpus.Corpus.corpus(spark, sfDir),
        ("func" +: rare).map(t => ("cap", t, 10)).toDF("query_id", "term", "k")).collect()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
      assert(got.map(key).toSeq === want.map(key).toSeq,
        "capped fallback diverged from the oracle plan")
      // with the cap restored, the same query routes hybrid (bounded union)
      Wand.HybridMaxRarePostings = prev
      val m2 = QueryMetrics(spark)
      val got2 = Wand.topKAt(spark, paths, Seq(q.copy(queryId = "cap2")), Some(m2)).collect()
      assert(m2.routedHybrid.value === 1L && m2.routedWand.value === 0L,
        s"hybrid route not re-engaged: routes = ${m2.snapshot}")
      assert(got2.map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))).toSeq ===
        got.map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))).toSeq,
        "hybrid and WAND answers must be identical")
    } finally Wand.HybridMaxRarePostings = prev
  }

  test("layered root: addBatch re-ranks the sidecar, fast route engages at the new avgdl") {
    // the steady state at scale: between an add and the next compact the
    // root is layered, and hot single-term queries must STILL be O(k) —
    // the sidecar is whole-re-ranked at the post-add stats by addBatch
    // (tfNorm order is not avgdl-stable, so the base build's prefixes
    // cannot be reused)
    val root = "target/graft-index/test-fast-layered"
    Bench.deleteTree(root)
    val basePaths = graft.index.IndexPaths(s"$root/base")
    val outPaths = graft.index.IndexPaths(s"$root/out")
    val full = graft.corpus.Corpus.corpus(spark, sfDir)
    IndexBuilder.build(spark, graft.corpus.Corpus.baseSlice(full), basePaths,
      buildArgs = "fast-layered-base")
    graft.index.Incremental.addBatch(spark, basePaths, full, outPaths)
    val reader = IndexReader.get(spark, outPaths)
    assert(reader.layers.size === 2, "fixture must be a genuinely layered root")
    val m = QueryMetrics(spark)
    val got = Wand.topKAt(spark, outPaths, Seq(Query("lay", Seq("func"), 10)), Some(m)).collect()
    assert(m.routedFast.value === 1L,
      s"fast route must engage on the layered root: ${m.snapshot}")
    assert(m.candidates.value === 10L, "layered fast serve must evaluate k, not df")
    // rank-identical to the naive oracle plan over the FULL corpus (the
    // layered root's merged content)
    val s = spark; import s.implicits._
    val want = NaiveSearch.topK(spark, full,
      Seq(("lay", "func", 10)).toDF("query_id", "term", "k")).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
    assert(got.map(key).toSeq === want.map(key).toSeq,
      "layered fast serve diverged from the full-corpus oracle plan")
  }

  test("k > FastK falls back to the exact path (and still matches naive)") {
    val q = Query("big", Seq("func"), IndexBuilder.FastK + 1)
    val m = QueryMetrics(spark)
    val got = Wand.topKAt(spark, paths, Seq(q), Some(m)).count()
    assert(got === (IndexBuilder.FastK + 1).toLong)
    val reader = IndexReader.get(spark, paths)
    assert(m.candidates.value > reader.fastList("func").get.ids.length.toLong,
      "k > FastK must not use the truncated prefix")
  }
}
