package graft

import graft.corpus.Corpus
import graft.engine.Wand
import graft.index.{IndexBuilder, IndexPaths}
import graft.queries.QuerySet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule's N vs 4N criterion.
  *
  * No real cluster exists in this sandbox, so per the baseline protocol the
  * SAME job runs at two `local[n]` levels on the same input; efficiency =
  * (T_N / T_4N) / 4. Two methodology notes, both learned the hard way:
  *
  *  - one JVM per level: running both levels in one process contaminates
  *    the second leg (heap/GC carryover inflated a 32-core build 52 → 90 s);
  *  - the corpus is replicated `k×` (deterministic commit-suffix variants,
  *    distinct docIds) so the parallel portion dominates: at plain sf0.1
  *    the ~25-30 s of fixed JVM/codegen/planning cost swamps the scalable
  *    work and no core count can show its speedup.
  *
  * Usage (one leg per invocation, efficiency computed across legs):
  * ```
  * sbt -batch "runMain graft.ScalingBench /root/testdata/sf0.1 8 4"
  * sbt -batch "runMain graft.ScalingBench /root/testdata/sf0.1 32 4"
  * ```
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val replicate = args.lift(2).map(_.toInt).getOrElse(4)
    // optional tmpfs base: the sandbox disk throttles in bursts (identical
    // runs flip between 15 s and 280 s on the write-heavy phases); putting
    // index + shuffle dirs in RAM isolates the compute-scaling signal the
    // N-vs-4N criterion is about
    val rootBase = args.lift(3).getOrElse("target/graft-index")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_SPARK_LOCAL", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val base = Corpus.corpus(spark, sfDir)
      // k deterministic variants with distinct (repo,path,commit) keys —
      // content identical, so term statistics scale uniformly
      val corpus =
        if (replicate <= 1) base
        else (0 until replicate).map { i =>
          base.withColumn("commit",
            concat(substring(col("commit"), 1, 8), lit(f"r$i%02d")))
        }.reduce(_ union _)

      val root = s"$rootBase/scaling-cpus$cpus-x$replicate"
      Bench.deleteTree(root)
      val (stats, tBuild) = Bench.time {
        IndexBuilder.build(spark, corpus, IndexPaths(root), buildArgs = s"scaling x$replicate")
      }
      System.err.println(s"[scaling] build done in $tBuild s")
      val (_, tWand) = Bench.time {
        Wand.topKAt(spark, IndexPaths(root), QuerySet.all).count()
      }
      println(s"""{"metric":"scaling","cpus":$cpus,"replicate":$replicate,""" +
        s""""build_sec":$tBuild,"docs_per_sec":${stats.nDocs / tBuild},""" +
        s""""n_docs":${stats.nDocs},"wand_set_sec":$tWand,"sf":"$sfDir"}""")
    } finally spark.stop()
  }
}
