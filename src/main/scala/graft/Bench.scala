package graft

import graft.corpus.Corpus
import graft.engine.{IndexSearch, NaiveSearch, Wand}
import graft.index.{IndexBuilder, IndexPaths}
import graft.queries.QuerySet
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main — emits ONE JSON line per the driver contract:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Components (all seconds):
  *  - index_build_full:   cold corpus → segments → merge → stats
  *  - bm25_naive_set:     full-scoring query set (no index)
  *  - query_index_p50/p99, query_wand_p50/p99: per-query latency over the
  *    reference query set against the cached index
  * Plus informational extras: docs_per_sec, n_docs.
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

  def run(spark: SparkSession, sfDir: String, indexRoot: String): (Map[String, Double], Map[String, Double]) = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val paths = IndexPaths(indexRoot)
    deleteTree(indexRoot)

    // executor CPU time per phase: utilization = cpu/(wall×cores) is the
    // steal/disk-burst-immune signal (see BASELINE.md scaling analysis)
    val cpu = new CpuTimeListener
    spark.sparkContext.addSparkListener(cpu)
    val cores = spark.sparkContext.defaultParallelism

    val (stats, tBuild) = time {
      IndexBuilder.build(spark, Corpus.corpus(spark, sfDir), paths, buildArgs = s"bench-$sfName")
    }
    // drain queued onTaskEnd events before reading (async listener bus)
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    val buildCpu = cpu.cpuSec
    System.err.println(s"[bench] build done in $tBuild s (cpu $buildCpu s)")

    val (_, tNaive) = time {
      NaiveSearch.topK(spark, Corpus.corpus(spark, sfDir), QuerySet.df(spark)).count()
    }
    System.err.println(s"[bench] naive set done in $tNaive s")

    // warm the index reader once, then per-query latencies. reps=10 over
    // the 10-query set = 100 samples per path, so the reported p99 is the
    // 99th percentile (2nd-worst sample), not the max (round-2 finding:
    // at n=30 one sandbox disk burst DEFINED the p99).
    val (_, tWarm) = time(IndexSearch.topKAt(spark, paths, QuerySet.df(spark)).count())
    System.err.println(s"[bench] index warm set done in $tWarm s")
    val reps = Config.benchReps
    val indexLat = for { _ <- 1 to reps; q <- QuerySet.all } yield {
      import spark.implicits._
      val qdf = Seq(q).flatMap(x => x.terms.map(t => (x.queryId, t, x.k)))
        .toDF("query_id", "term", "k")
      time(IndexSearch.topKAt(spark, paths, qdf).count())._2
    }
    System.err.println(s"[bench] index per-query done: ${indexLat.sum} s total")
    Wand.topKAt(spark, paths, QuerySet.all).count() // warm the segment cache
    val wandLat = for { _ <- 1 to reps; q <- QuerySet.all } yield
      time(Wand.topKAt(spark, paths, Seq(q)).count())._2
    System.err.println(s"[bench] wand per-query done: ${wandLat.sum} s total")

    val queries = Map(
      "index_build_full" -> tBuild,
      "bm25_naive_set" -> tNaive,
      "query_index_p50" -> percentile(indexLat, 0.5),
      "query_index_p99" -> percentile(indexLat, 0.99),
      "query_wand_p50" -> percentile(wandLat, 0.5),
      "query_wand_p99" -> percentile(wandLat, 0.99))
    val extras = Map(
      "docs_per_sec" -> stats.nDocs / tBuild,
      "n_docs" -> stats.nDocs.toDouble,
      "query_samples_per_path" -> (reps * QuerySet.all.size).toDouble,
      "build_cpu_sec" -> buildCpu,
      "build_cpu_util" -> buildCpu / (tBuild * cores))
    (queries, extras)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val cpus = Config.cpus
    val spark = Config.session()
    val (queries, extras) = run(spark, sfDir, s"target/graft-index/bench-cpus$cpus")
    val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val ex = extras.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val total = queries.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$ex,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
