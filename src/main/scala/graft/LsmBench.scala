package graft

import graft.corpus.Corpus
import graft.engine.Wand
import graft.index.{Incremental, IndexBuilder, IndexPaths}
import graft.queries.QuerySet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSM cost/benefit benchmark — what the layered design buys and what it
  * charges (BASELINE.md "incremental economics" table):
  *
  *  - `full_build_sec`  : from-scratch build of the WHOLE corpus
  *  - `base_build_sec`  : build of the 80% base
  *  - `delta_add_sec`   : `Incremental.addBatch` of the remaining 20% —
  *                        the number that must be DELTA-sized, not
  *                        rebuild-sized, for the LSM design to matter
  *  - `wand_single_sec` / `wand_layered_sec` / `wand_compacted_sec`:
  *                        the reference query set (warm reader) against the
  *                        single-layer root, the 2-layer root, and the
  *                        compacted root — the layered serving tax
  *  - `compact_sec`     : folding the 2 layers back to one
  *
  * One JSON line to stdout, same conventions as [[Bench]].
  */
object LsmBench {

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val cpus = Config.cpus
    val spark = Config.session()
    try {
      val rootBase = "target/graft-lsm"
      Bench.deleteTree(rootBase)
      val full = Corpus.corpus(spark, sfDir)
      val base = Corpus.baseSlice(full)

      val pFull = IndexPaths(s"$rootBase/full")
      val pBase = IndexPaths(s"$rootBase/base")
      val pOut = IndexPaths(s"$rootBase/out")

      val (_, tFull) = Bench.time(IndexBuilder.build(spark, full, pFull, buildArgs = "lsm-full"))
      System.err.println(s"[lsm] full build: $tFull s")
      val (_, tBase) = Bench.time(IndexBuilder.build(spark, base, pBase, buildArgs = "lsm-base"))
      System.err.println(s"[lsm] base build: $tBase s")
      val (_, tAdd) = Bench.time(Incremental.addBatch(spark, pBase, full, pOut))
      System.err.println(s"[lsm] delta add: $tAdd s")

      def wandSet(p: IndexPaths): Double = {
        Wand.topKAt(spark, p, QuerySet.all).count() // warm the reader + cache
        val (_, t) = Bench.time(Wand.topKAt(spark, p, QuerySet.all).count())
        t
      }
      val tWandSingle = wandSet(pFull)
      System.err.println(s"[lsm] wand single-layer: $tWandSingle s")
      val tWandLayered = wandSet(pOut)
      System.err.println(s"[lsm] wand layered: $tWandLayered s")
      val (_, tCompact) = Bench.time(Incremental.compact(spark, pOut.root))
      System.err.println(s"[lsm] compact: $tCompact s")
      val tWandCompacted = wandSet(pOut)
      System.err.println(s"[lsm] wand compacted: $tWandCompacted s")

      println(s"""{"metric":"lsm","full_build_sec":$tFull,"base_build_sec":$tBase,""" +
        s""""delta_add_sec":$tAdd,"wand_single_sec":$tWandSingle,""" +
        s""""wand_layered_sec":$tWandLayered,"compact_sec":$tCompact,""" +
        s""""wand_compacted_sec":$tWandCompacted,"cpus":$cpus,"sf":"$sfDir"}""")
    } finally spark.stop()
  }
}
