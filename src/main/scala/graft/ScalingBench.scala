package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule's N vs 4N criterion.
  *
  * No real cluster exists in this sandbox, so per the baseline protocol the
  * SAME job (cold index build + query set) runs at two `local[n]` levels on
  * the same input; efficiency = (T_N / T_4N) / 4. Emits one JSON line per
  * level plus a summary line; results land in BASELINE.md.
  *
  * Usage: `runMain graft.ScalingBench [sfDir] [nLow] [nHigh]` (default
  * /root/testdata/sf0.1 8 32).
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nLow = args.lift(1).map(_.toInt).getOrElse(8)
    val nHigh = args.lift(2).map(_.toInt).getOrElse(32)

    def runAt(cpus: Int): (Map[String, Double], Map[String, Double]) = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try Bench.run(spark, sfDir, s"target/graft-index/scaling-cpus$cpus")
      finally spark.stop()
    }

    val results = Seq(nLow, nHigh).map { n =>
      val (queries, extras) = runAt(n)
      val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val ex = extras.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      println(s"""{"metric":"scaling","cpus":$n,"queries":$qs,$ex,"sf":"$sfDir"}""")
      n -> queries
    }.toMap

    val tLow = results(nLow)("index_build_full")
    val tHigh = results(nHigh)("index_build_full")
    val factor = nHigh.toDouble / nLow
    val eff = (tLow / tHigh) / factor
    val qLow = results(nLow)("query_wand_p50")
    val qHigh = results(nHigh)("query_wand_p50")
    println(s"""{"metric":"scaling_efficiency","value":$eff,"n_low":$nLow,"n_high":$nHigh,""" +
      s""""build_sec_low":$tLow,"build_sec_high":$tHigh,""" +
      s""""wand_p50_low":$qLow,"wand_p50_high":$qHigh,"sf":"$sfDir"}""")
  }
}
