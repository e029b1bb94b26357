package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Per-query execution counters — the engine analog of the reference's
  * Prometheus `/metrics` endpoint (`pkg/route/route.go:32`) and per-request
  * latency/UID logging (`pkg/logging/http_logging.go:31-46`). Spark-native:
  * the counters are `LongAccumulator`s, so executor-side WAND runs report
  * into them with no extra shuffle or collect, and a cluster UI / history
  * server sees them as named accumulators per stage.
  *
  *  - `candidates`: docs fully scored (WAND pivot evaluations)
  *  - `blocksDecoded`: posting blocks decompressed by THIS query (0 on a
  *    cache-warm rerun — the block-cache hit-rate signal)
  *  - `blockSkips`: BMW window-skip events (blocks bounded below the heap
  *    threshold and never decompressed — the WAND effectiveness signal)
  */
final case class QueryMetrics(
    candidates: LongAccumulator,
    blocksDecoded: LongAccumulator,
    blockSkips: LongAccumulator) extends Serializable {

  def snapshot: Map[String, Long] = Map(
    "candidates_evaluated" -> candidates.value,
    "blocks_decoded" -> blocksDecoded.value,
    "block_skips" -> blockSkips.value)
}

object QueryMetrics {
  def apply(spark: SparkSession): QueryMetrics = QueryMetrics(
    spark.sparkContext.longAccumulator("graft.query.candidates"),
    spark.sparkContext.longAccumulator("graft.query.blocksDecoded"),
    spark.sparkContext.longAccumulator("graft.query.blockSkips"))
}

/** Executor-local mutable counters for one WAND shard run (summed into the
  * [[QueryMetrics]] accumulators after the run).
  */
final class WandCounters {
  var evaluated: Long = 0L
  var skips: Long = 0L
}
