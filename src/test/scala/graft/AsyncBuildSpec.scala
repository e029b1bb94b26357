package graft

import graft.index.{IndexBuilder, IndexPaths}
import java.util.concurrent.CountDownLatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** The `wait_crawl=false` analog (`clamber/cmd/api/http.go:76-84`):
  * trigger → refuse-while-incomplete → poll → serve. The corpus is gated on
  * a latch (local mode = executors in this JVM), so "build in flight" is a
  * deterministic state, not a timing race: while the latch is closed the
  * build CANNOT complete, and the spec asserts the 503-analog refusal and
  * the per-root Future dedupe in that window.
  */
class AsyncBuildSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("trigger returns immediately; serving refuses until complete; retrigger dedupes") {
    val root = s"target/graft-index/v${IndexBuilder.FormatVersion}/async-spec"
    IndexBuilder.deleteRecursively(java.nio.file.Paths.get(root))
    val paths = IndexPaths(root)

    AsyncBuildSpec.gate = new CountDownLatch(1)
    val gateUdf = udf(() => { AsyncBuildSpec.gate.await(); true })
    val corpus = graft.corpus.Corpus.corpus(spark, "/root/testdata/sf0.001")
      .limit(300).filter(gateUdf())

    val f1 = IndexBuilder.buildAsync(spark, corpus, paths, buildArgs = "async-spec")
    // deterministically in flight: the gate is closed, the build can't finish
    assert(!f1.isCompleted, "trigger must return before the build completes")
    // 503 analog: an in-flight root refuses to serve rather than answer partially
    intercept[IllegalStateException](IndexBuilder.open(paths))
    // retrigger while in flight = the SAME handle (conditional-upsert idempotency)
    val f2 = IndexBuilder.buildAsync(spark, corpus, paths, buildArgs = "async-spec")
    assert(f1 eq f2, "in-flight retrigger must dedupe to the original Future")

    AsyncBuildSpec.gate.countDown()
    val stats = scala.concurrent.Await.result(f1, 5.minutes)
    assert(stats.nDocs > 0L)
    // now complete: open() serves, and a fresh trigger is the cache-hit path
    assert(IndexBuilder.open(paths).nDocs === stats.nDocs)
    val f3 = IndexBuilder.buildAsync(spark, corpus, paths, buildArgs = "async-spec")
    assert(f3.isCompleted, "complete root must yield an already-completed Future")
    // the built root actually answers queries end-to-end
    val hits = graft.engine.SearchApi.search(spark, paths, Seq("func"), 5)
    assert(hits.count() === 5)
  }

  test("ensureAsync shares ensure()'s path scheme and converges on the same root") {
    // trigger-or-reuse by sf dir: await the async result FIRST, then the
    // synchronous ensure must find the same complete root (cache-hit path)
    val (ePaths, ef) = IndexBuilder.ensureAsync(spark, "/root/testdata/sf0.001")
    val eStats = scala.concurrent.Await.result(ef, 10.minutes)
    assert(eStats.nDocs > 0L)
    val (sPaths, sStats) = IndexBuilder.ensure(spark, "/root/testdata/sf0.001")
    assert(sPaths.root === ePaths.root, "ensureAsync diverged from ensure()'s root scheme")
    assert(sStats.nDocs === eStats.nDocs)
  }
}

object AsyncBuildSpec {
  /** Latch the gated corpus blocks on — static so executor threads (same
    * JVM in local mode) and the test share it.
    */
  @volatile var gate: CountDownLatch = _
}
