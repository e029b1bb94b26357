package graft

import graft.corpus.Corpus
import graft.engine.{IndexSearch, NaiveSearch, QueryMetrics, SearchApi, Wand}
import graft.index.{IndexBuilder, IndexPaths}
import graft.queries.QuerySet
import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main — emits ONE JSON line per the driver contract:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Components (all seconds):
  *  - index_build_full:   cold corpus → segments → merge → stats
  *  - bm25_naive_set:     full-scoring query set (no index)
  *  - query_serve_p50/p99: THE HEADLINE SERVING PAIR — per-query latency of
  *    [[SearchApi.search]] (validation + block-max WAND + collect), i.e.
  *    what a request to the engine actually pays.
  *  - query_wand_p50/p99: the SAME query set with the fast/hybrid routes
  *    disabled ([[Wand.ForceWandRoute]]) — a true WAND-path measurement,
  *    round-over-round comparable with the pre-fast-route rounds (a silent
  *    alias of query_serve_* would conflate routing wins with WAND wins).
  *  - query_index_p50/p99: the full-materialization index path. This is the
  *    ORACLE path (rank-identity cross-check vs DuckDB), not the serving
  *    path — it decodes each query term's whole posting list into rows, so
  *    its hot-term latency is postings-bound by design; reported as a
  *    labeled diagnostic, not a serving claim.
  *
  * Per-sample evidence (round-3 finding: the driver-run p99 was 10–50×
  * the repo-run p99 and a single aggregated percentile could not attribute
  * it): every latency sample appends one JSON line to
  * `bench/samples_<sf>_cpus<n>.jsonl` with wall, GC-time/GC-count deltas,
  * process-CPU delta, heap in use, and the WAND counters — so a 100×
  * outlier is attributable (GC pause? CPU starvation by a co-tenant host
  * process? cache eviction?) instead of debatable.
  */
object Bench {

  def deleteTree(p: String): Unit =
    IndexBuilder.deleteRecursively(Paths.get(p))

  def percentile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
  }

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // ---------- per-sample meters ----------

  private def gcTotals(): (Long, Long) = {
    var ms = 0L; var n = 0L
    ManagementFactory.getGarbageCollectorMXBeans.asScala.foreach { b =>
      val t = b.getCollectionTime; val c = b.getCollectionCount
      if (t > 0) ms += t
      if (c > 0) n += c
    }
    (ms, n)
  }

  private def processCpuMs(): Long =
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
      case _ => -1L
    }

  private def heapUsedMb(): Long =
    ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / (1024 * 1024)

  /** Sum of CPU time over all live JAVA threads, ms. The three-way split
    * per sample is the attribution that settles a latency tail:
    *  - task_cpu ≈ proc_cpu        → amplified TASK work (engine problem)
    *  - java threads ≫ task_cpu    → driver/other java threads
    *  - proc_cpu ≫ java threads    → NATIVE threads (G1 concurrent mark /
    *                                 JIT compiler), invisible to gc_ms
    *  - wall ≫ proc_cpu/cores      → the JVM never got the cores: external
    *                                 host contention, not this engine.
    */
  private def javaThreadCpuMs(): Long = {
    val t = ManagementFactory.getThreadMXBean
    if (!t.isThreadCpuTimeSupported) return -1L
    var sum = 0L
    t.getAllThreadIds.foreach { id =>
      val c = t.getThreadCpuTime(id)
      if (c > 0) sum += c
    }
    sum / 1000000L
  }

  /** 1-minute system load average (normalize by cores to spot co-tenants). */
  private def load1(): Double =
    ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** Appends one JSON object per latency sample to the samples file. */
  private final class SampleLog(path: java.nio.file.Path, t0Nanos: Long,
      taskCpu: CpuTimeListener, sc: org.apache.spark.SparkContext) {
    Files.createDirectories(path.getParent)
    Files.deleteIfExists(path)
    private val w = Files.newBufferedWriter(path, StandardOpenOption.CREATE, StandardOpenOption.APPEND)

    /** Times `f`, metering GC / process-CPU / task-CPU / java-thread-CPU /
      * heap / system load around it plus the accumulator deltas of `m`
      * (if given); returns the wall seconds. The listener bus is drained
      * before reading task CPU (async onTaskEnd undercounts otherwise).
      */
    def sample(pathName: String, rep: Int, queryId: String, m: Option[QueryMetrics])(f: => Unit): Double = {
      val (gcMs0, gcN0) = gcTotals()
      val cpu0 = processCpuMs()
      val jt0 = javaThreadCpuMs()
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      val task0 = (taskCpu.cpuSec * 1000).toLong
      val acc0 = m.map(x => (x.candidates.value, x.blocksDecoded.value, x.blockSkips.value))
      val tOff = (System.nanoTime() - t0Nanos) / 1e9
      val (_, wall) = time(f)
      val (gcMs1, gcN1) = gcTotals()
      val cpu1 = processCpuMs()
      val jt1 = javaThreadCpuMs()
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      val task1 = (taskCpu.cpuSec * 1000).toLong
      val counters = (m, acc0) match {
        case (Some(x), Some((c0, b0, s0))) =>
          s""","candidates":${x.candidates.value - c0},"blocks_decoded":${x.blocksDecoded.value - b0},"block_skips":${x.blockSkips.value - s0}"""
        case _ => ""
      }
      w.write(
        s"""{"path":"$pathName","rep":$rep,"query":"$queryId","t_off_s":${f"$tOff%.3f"},""" +
          s""""wall_s":${f"$wall%.6f"},"gc_ms":${gcMs1 - gcMs0},"gc_n":${gcN1 - gcN0},""" +
          s""""proc_cpu_ms":${cpu1 - cpu0},"task_cpu_ms":${task1 - task0},""" +
          s""""java_cpu_ms":${jt1 - jt0},"load1":${f"${load1()}%.1f"},""" +
          s""""heap_mb":${heapUsedMb()}$counters}""")
      w.newLine(); w.flush()
      wall
    }

    def note(kind: String, detail: String): Unit = {
      val tOff = (System.nanoTime() - t0Nanos) / 1e9
      w.write(s"""{"path":"note","kind":"$kind","t_off_s":${f"$tOff%.3f"},$detail}""")
      w.newLine(); w.flush()
    }

    // meter snapshot at the last phase boundary — build/add phases run
    // sequentially on this thread, so end-minus-previous-end deltas are
    // exact per-phase attribution
    private var phGcMs = 0L; private var phGcN = 0L
    private var phCpu = 0L; private var phTask = 0L

    def phaseReset(): Unit = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      val (g, n) = gcTotals()
      phGcMs = g; phGcN = n; phCpu = processCpuMs()
      phTask = (taskCpu.cpuSec * 1000).toLong
    }

    /** One attributed line per completed build/add phase (task-CPU, GC,
      * process-CPU deltas, load1, heap) — the round-4 driver leg's 3.6×
      * build-wall inflation had to be attributed by cross-referencing repo
      * legs; with this, a slow phase self-attributes inside the artifact.
      */
    def phaseSample(tag: String, name: String, wall: Double): Unit = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      val (g, n) = gcTotals()
      val c = processCpuMs()
      val t = (taskCpu.cpuSec * 1000).toLong
      val tOff = (System.nanoTime() - t0Nanos) / 1e9
      w.write(
        s"""{"path":"phase","tag":"$tag","phase":"$name","t_off_s":${f"$tOff%.3f"},""" +
          s""""wall_s":${f"$wall%.6f"},"gc_ms":${g - phGcMs},"gc_n":${n - phGcN},""" +
          s""""proc_cpu_ms":${c - phCpu},"task_cpu_ms":${t - phTask},""" +
          s""""load1":${f"${load1()}%.1f"},"heap_mb":${heapUsedMb()}}""")
      w.newLine(); w.flush()
      phGcMs = g; phGcN = n; phCpu = c; phTask = t
    }

    def close(): Unit = w.close()
  }

  def run(spark: SparkSession, sfDir: String, indexRoot: String): (Map[String, Double], Map[String, Double], String) = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val paths = IndexPaths(indexRoot)
    deleteTree(indexRoot)
    val t0Nanos = System.nanoTime()
    // executor CPU time per phase: utilization = cpu/(wall×cores) is the
    // steal/disk-burst-immune signal (see BASELINE.md scaling analysis)
    val cpu = new CpuTimeListener
    spark.sparkContext.addSparkListener(cpu)
    val cores = spark.sparkContext.defaultParallelism
    val samplesPath = Paths.get(s"bench/samples_${sfName}_cpus$cores.jsonl")
    val log = new SampleLog(samplesPath, t0Nanos, cpu, spark.sparkContext)

    // build + naive are sampled through the same attributed meter as every
    // query (wall, GC, proc/task CPU, load1), and each inner build phase
    // additionally writes its own delta line via the phase hook — a slow
    // driver-environment build now self-attributes per phase in-artifact.
    log.phaseReset()
    IndexBuilder.phaseHook = (tag, name, wall) => log.phaseSample(tag, name, wall)
    var stats: graft.index.IndexStats = null
    val tBuild = try {
      log.sample("build", 1, "index_build_full", None) {
        stats = IndexBuilder.build(spark, Corpus.corpus(spark, sfDir), paths, buildArgs = s"bench-$sfName")
      }
    } finally IndexBuilder.phaseHook = (_, _, _) => ()
    // drain queued onTaskEnd events before reading (async listener bus)
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    val buildCpu = cpu.cpuSec
    System.err.println(s"[bench] build done in $tBuild s (cpu $buildCpu s)")

    val tNaive = log.sample("naive", 1, "bm25_naive_set", None) {
      NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), QuerySet.df(spark)).count(): Unit
    }
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    val naiveCpu = cpu.cpuSec - buildCpu
    System.err.println(s"[bench] naive set done in $tNaive s (cpu $naiveCpu s)")

    // Build + naive leave a heap full of garbage (posting buffers, shuffle
    // blocks) AND the naive plan's persisted tf relation (NaiveSearch
    // persists it for its four consumers; nothing downstream uses it).
    // Drop every persisted RDD — the reader has not opened yet, so this is
    // a clean slate — then one explicit full GC separates "build garbage
    // collected during the latency loop" (hygiene, these lines) from "GC
    // caused by the queries themselves" (a real cost, visible per sample).
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val (_, tGcFence) = time(System.gc())
    log.note("gc_fence", s""""after":"build+naive","wall_s":${f"$tGcFence%.3f"},"heap_mb":${heapUsedMb()}""")
    System.err.println(s"[bench] post-build GC fence: $tGcFence s")

    // warm the index reader once, then per-query latencies. reps=10 over
    // the 10-query set = 100 samples per path, so the reported p99 is the
    // 99th percentile (2nd-worst sample), not the max (round-2 finding:
    // at n=30 one sandbox disk burst DEFINED the p99).
    val (_, tWarm) = time(IndexSearch.topKAt(spark, paths, QuerySet.df(spark)).count())
    System.err.println(s"[bench] index warm set done in $tWarm s")
    val reps = Config.benchReps
    val indexLat = for { rep <- 1 to reps; q <- QuerySet.all } yield {
      import spark.implicits._
      val qdf = Seq(q).flatMap(x => x.terms.map(t => (x.queryId, t, x.k)))
        .toDF("query_id", "term", "k")
      log.sample("index", rep, q.queryId, None)(IndexSearch.topKAt(spark, paths, qdf).count(): Unit)
    }
    System.err.println(s"[bench] index (oracle path) per-query done: ${indexLat.sum} s total")

    // THE SERVING PATH: SearchApi.search == validation + block-max WAND +
    // collect — the latency a request actually pays. Counters (candidates /
    // blocks decoded / skips) are metered per sample.
    val m = QueryMetrics(spark)
    Wand.topKAt(spark, paths, QuerySet.all).count() // warm the segment cache
    val serveLat = for { rep <- 1 to reps; q <- QuerySet.all } yield
      log.sample("serve", rep, q.queryId, Some(m))(
        SearchApi.search(spark, paths, q.terms, q.k, conjunctive = false, Some(m)).collect(): Unit)
    System.err.println(s"[bench] serve (routed) per-query done: ${serveLat.sum} s total")

    // WAND-only leg: identical queries with the fast/hybrid routes disabled,
    // so query_wand_* keeps measuring the WAND path itself (comparable with
    // pre-fast-route rounds) instead of aliasing the routed serving pair.
    Wand.ForceWandRoute = true
    val wandLat = try {
      val mW = QueryMetrics(spark)
      Wand.topKAt(spark, paths, QuerySet.all).count() // warm the forced path
      for { rep <- 1 to reps; q <- QuerySet.all } yield
        log.sample("wand", rep, q.queryId, Some(mW))(
          SearchApi.search(spark, paths, q.terms, q.k, conjunctive = false, Some(mW)).collect(): Unit)
    } finally Wand.ForceWandRoute = false
    System.err.println(s"[bench] wand (forced) per-query done: ${wandLat.sum} s total")
    log.close()

    def stat(name: String, xs: Seq[Double]): Seq[(String, Double)] = Seq(
      s"${name}_mean" -> xs.sum / xs.size,
      s"${name}_max" -> xs.max)

    val queries = Map(
      "index_build_full" -> tBuild,
      "bm25_naive_set" -> tNaive,
      "query_serve_p50" -> percentile(serveLat, 0.5),
      "query_serve_p99" -> percentile(serveLat, 0.99),
      // distinct samples: the SAME queries forced down the WAND route
      "query_wand_p50" -> percentile(wandLat, 0.5),
      "query_wand_p99" -> percentile(wandLat, 0.99),
      "query_index_p50" -> percentile(indexLat, 0.5),
      "query_index_p99" -> percentile(indexLat, 0.99))
    val extras = Map(
      "docs_per_sec" -> stats.nDocs / tBuild,
      "n_docs" -> stats.nDocs.toDouble,
      "query_samples_per_path" -> (reps * QuerySet.all.size).toDouble,
      "build_cpu_sec" -> buildCpu,
      "build_cpu_util" -> buildCpu / (tBuild * cores),
      "naive_cpu_sec" -> naiveCpu,
      "naive_cpu_util" -> naiveCpu / (tNaive * cores),
      "gc_fence_sec" -> tGcFence) ++
      stat("query_serve", serveLat) ++ stat("query_wand", wandLat) ++ stat("query_index", indexLat)
    (queries, extras, samplesPath.toString)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val cpus = Config.cpus
    val spark = Config.session()
    val (queries, extras, samplesFile) = run(spark, sfDir, s"target/graft-index/bench-cpus$cpus")
    val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val ex = extras.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val total = queries.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$ex,"samples_file":"$samplesFile","cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
