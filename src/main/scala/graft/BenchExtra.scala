package graft

/** Extra (non-contract) benchmarks for the optimization rounds — per-entry
  * wall timing of every [[SparkEntry.queries]] operator through the noop
  * sink (guide §1.4: computes every column of every row, no sink cost), so
  * Verify-wall attribution and operator-level before/after numbers have a
  * repeatable source. NOT part of the driver contract ([[Bench]] is frozen);
  * cited from OPTIMIZATION_r06.md only.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... sbt "runMain
  * graft.BenchExtra [entry ...]"` — with args, times only those entries.
  * Fixture-building side effects (index roots under target/) are identical
  * to a Verify run's; a cold run attributes fixture cost to the first entry
  * that needs it, exactly like Verify.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = Config.sfDir
    val spark = Config.session()
    val only = args.toSet
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val w = (System.nanoTime() - t0) / 1e9
          results(name) = w
          println(f"""{"entry":"$name","wall_s":$w%.3f}""")
        } catch {
          case e: Throwable =>
            println(s"""{"entry":"$name","error":"${Option(e.getMessage).getOrElse(e.getClass.getName).replace('"', '\'')}"}""")
        } finally spark.sparkContext.setJobDescription(null)
      }
    }
    val total = results.values.sum
    println(f"""{"metric":"bench_extra_total","value":$total%.3f,"unit":"sec","entries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
