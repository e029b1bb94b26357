package graft

import graft.engine.SearchApi
import graft.queries.QuerySet
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The query-API error matrix — SURVEY.md §5.2's mapping of the reference
  * HTTP status tests (`clamber/cmd/api/http_test.go:88-154`):
  * 400 (bad request) → IllegalArgumentException; 404 (unknown root) →
  * empty result, not an error; depth clamp → k clamp; 503 (store not
  * serving) → strict open() refusal (covered by IndexResumeSpec).
  */
class SearchApiSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    paths = graft.index.IndexBuilder.ensure(spark, sfDir)._1
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("empty term list rejects (400 analog: http_test.go:117-129)") {
    intercept[IllegalArgumentException](SearchApi.search(spark, paths, Nil, 10))
  }

  test("blank term rejects (400 analog)") {
    intercept[IllegalArgumentException](SearchApi.search(spark, paths, Seq("func", "  "), 10))
  }

  test("k <= 0 rejects (400 analog: http_test.go:131-141)") {
    intercept[IllegalArgumentException](SearchApi.search(spark, paths, Seq("func"), 0))
    intercept[IllegalArgumentException](SearchApi.search(spark, paths, Seq("func"), -3))
  }

  test("unknown term returns EMPTY result, not an error (404 analog: api/http.go:87-91)") {
    assert(SearchApi.search(spark, paths, Seq("zzznotfound"), 10).count() === 0)
  }

  test("oversized k clamps to MaxK (display_depth clamp, query.go:44-48)") {
    val res = SearchApi.search(spark, paths, Seq("handler_0_3"), Int.MaxValue)
    assert(res.count() >= 1) // rare term: small result, but the plan ran with clamped k
  }

  test("valid search returns at most k ranked rows with the pinned columns") {
    val res = SearchApi.search(spark, paths, Seq("func", "buffer"), 5).collect()
    assert(res.length === 5)
    assert(res.map(_.getInt(1)).toSeq === (1 to 5))
  }

  test("repo scope: WAND inner-loop filter == docs-join filter, and ranks are scope-local") {
    // two INDEPENDENT scope mechanisms must agree: the OR path rejects
    // candidates inside the WAND evaluation loop (broadcast docId set); the
    // index path filters the docs join before the ranking tail
    val scope = QuerySet.scopeRepos
    val wand = SearchApi.search(spark, paths, Seq("func", "buffer"), 10, repoScope = Some(scope)).collect()
    val viaIndex = {
      val s = spark; import s.implicits._
      val q = Seq(("adhoc", "func", 10), ("adhoc", "buffer", 10)).toDF("query_id", "term", "k")
      graft.engine.IndexSearch.topKAt(spark, paths, q, Some(scope)).collect()
    }
    assert(wand.map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4))).toSeq ===
      viaIndex.map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4))).toSeq)
    assert(wand.nonEmpty && wand.forall(r => scope.contains(r.getString(2))),
      "scoped results must come from scoped repos only")
    assert(wand.map(_.getInt(1)).toSeq === (1 to wand.length), "ranks must be scope-local and gapless")
  }

  test("large scope bypasses the broadcast-array probe (Bloom regime); results identical") {
    val scope = QuerySet.scopeRepos
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getDouble(5))
    val exact = SearchApi.search(spark, paths, Seq("func", "buffer"), 10,
      repoScope = Some(scope)).collect()
    val prev = graft.engine.IndexReader.scopeExactMax
    // force every scope over the exact-probe bound; invalidate so the scope
    // cache can't serve the already-built exact probe
    graft.engine.IndexReader.scopeExactMax = 0L
    graft.engine.IndexReader.invalidate(paths.root)
    try {
      val probe = graft.engine.IndexReader.get(spark, paths).scopeProbe(scope)
      assert(!probe.exact, "scope above the exact bound must use the Bloom probe")
      val bloom = SearchApi.search(spark, paths, Seq("func", "buffer"), 10,
        repoScope = Some(scope)).collect()
      assert(bloom.map(key).toSeq === exact.map(key).toSeq,
        "Bloom-scoped results diverged from the exact-probe results")
    } finally {
      graft.engine.IndexReader.scopeExactMax = prev
      graft.engine.IndexReader.invalidate(paths.root)
    }
  }

  test("concurrent scope probes for one new scope build exactly one probe") {
    // scopeProbe construction is lock-guarded: a bare TrieMap.getOrElseUpdate
    // can run the thunk on BOTH racing threads, duplicating the scope-scan
    // job and leaking the loser's broadcast (invalidate only releases probes
    // that won the cache slot). Under the lock, both callers must observe
    // the SAME probe instance.
    val scope = QuerySet.scopeRepos
    graft.engine.IndexReader.invalidate(paths.root)
    val reader = graft.engine.IndexReader.get(spark, paths)
    val start = new java.util.concurrent.CountDownLatch(1)
    val probes = new java.util.concurrent.ConcurrentLinkedQueue[graft.engine.ScopeProbe]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => { start.await(); probes.add(reader.scopeProbe(scope)) })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    val ps = probes.toArray(Array.empty[graft.engine.ScopeProbe])
    assert(ps.length == 2 && (ps(0) eq ps(1)),
      "racing scopeProbe calls built distinct probe instances")
    graft.engine.IndexReader.invalidate(paths.root)
  }

  test("empty repo scope rejects (400 analog); scoping to an absent repo yields empty") {
    intercept[IllegalArgumentException](
      SearchApi.search(spark, paths, Seq("func"), 10, repoScope = Some(Nil)))
    assert(SearchApi.search(spark, paths, Seq("func"), 10,
      repoScope = Some(Seq("repo-does-not-exist"))).count() === 0)
  }

  test("metered search executes, returns rows + populated counters, and logs a request line") {
    val (rows, stats) = SearchApi.searchMetered(spark, paths, Seq("func", "buffer"), 5)
    assert(rows.length === 5)
    assert(stats("n_results") === 5L)
    assert(stats("candidates_evaluated") > 0L, s"no candidates counted: $stats")
    assert(stats.contains("latency_ms") && stats.contains("blocks_decoded") && stats.contains("block_skips"))
    // hot term at sf0.001 spans multiple blocks: a WARM rerun decodes none
    val (_, warm) = SearchApi.searchMetered(spark, paths, Seq("func", "buffer"), 5)
    assert(warm("blocks_decoded") === 0L, s"warm rerun re-decoded blocks: $warm")
  }

  test("conjunctive search returns only docs containing every term") {
    def keySet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      df.select("repo", "path", "commit").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val keys = keySet(SearchApi.search(spark, paths, Seq("func", "handler_0_3"), 10, conjunctive = true))
    // every hit must also be a hit for the rare term alone (func is in all docs)
    val rare = keySet(SearchApi.search(spark, paths, Seq("handler_0_3"), 1000))
    assert(keys.nonEmpty && keys.subsetOf(rare))
    // conjunction with an absent term is empty
    assert(SearchApi.search(spark, paths, Seq("func", "zzznotfound"), 10, conjunctive = true).count() === 0)
  }
}
