package graft.streaming

import graft.tokenize.Tokenizer
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators (SURVEY.md §2.9) — the reference's
  * frontier-queue semantics (`pkg/queue/queue.go`) re-expressed as bounded
  * streams: `readStream` micro-batches stand in for SQS polls, and
  * `Trigger.AvailableNow` drains the "queue" to a fixed point exactly like
  * the reference's `PollForFinishedCrawl` fixed-point loop
  * (`pkg/query/query.go:57-84`). Each op runs the stream to completion and
  * returns the final table, so the driver's batch contract still holds.
  */
object StreamingOps {

  private val ctr = new AtomicInteger(0)

  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def runToTable(df: DataFrame, spark: SparkSession): DataFrame = {
    val name = s"graft_stream_${ctr.incrementAndGet()}"
    val q = df.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streamed tokenize + tf over the documents table; must equal the batch
    * aggregation (exactly-once micro-batch semantics vs the reference's
    * at-most-once queue deletes — SURVEY.md ST2).
    */
  def streamedTermCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = spark.readStream.schema(DocumentsSchema)
      .parquet(s"$sfDir/documents.parque?") // glob → basePath = the sf dir
    val agg = stream
      .select(explode(Tokenizer.tokensCol(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    runToTable(agg, spark).orderBy("term")
  }

  /** Watermarked 1-hour tumbling-window counts by event type over the
    * events stream. Window starts emitted as epoch seconds for cross-engine
    * comparison.
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = spark.readStream.schema(EventsSchema)
      .parquet(s"$sfDir/events.parque?") // glob → basePath = the sf dir
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    runToTable(agg, spark)
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"), col("n"),
        graft.score.BM25.quantize(col("sum_value")).as("sum_value_r"))
      .orderBy("ws_epoch", "event_type")
  }

  // ---------- stateful sessionization (flatMapGroupsWithState) ----------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(count: Long, sum: Double, lastTsMs: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user running session state via mapGroupsWithState — the custom-
    * state streaming primitive (SURVEY.md §2.9/ST6 stretch). Used by the
    * streaming spec over a MemoryStream; complete-mode equivalent of a
    * groupBy(user_id) count/sum, which is what the spec asserts.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[Event]): org.apache.spark.sql.Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          var c = prev.count; var s = prev.sum; var last = prev.lastTsMs
          evs.foreach { e => c += 1; s += e.value; last = math.max(last, e.ts.getTime) }
          state.update(SessionState(c, s, last))
          SessionUpdate(uid, c, s)
      }
  }
}
