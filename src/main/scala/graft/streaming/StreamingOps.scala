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

  /** Run a streaming aggregation to its fixed point WITHOUT materializing
    * the aggregate in driver memory (round-2 finding: the Complete-mode
    * memory sink collected the full table every micro-batch). Update mode +
    * `foreachBatch` appends each batch's UPDATED rows to a parquet
    * changelog partitioned by batch id — the streaming-upsert shape you'd
    * write to an Iceberg/keyed table at 100 TB — and the final table is the
    * distributed newest-wins read-back per key (`max_by(values, batch_id)`),
    * never a driver-resident copy.
    */
  private def runViaChangelog(
      agg: DataFrame, spark: SparkSession,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val dir = s"target/graft-stream/changelog-${ctr.incrementAndGet()}"
    graft.Bench.deleteTree(dir)
    val q = agg.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(dir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a zero-batch run leaves no files to infer from
    val log = spark.read.schema(agg.schema.add("batch_id", LongType)).parquet(dir)
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valCols.map(col): _*), col("batch_id")).as("v"))
      .select(keyCols.map(col) ++ valCols.map(c => col(s"v.$c").as(c)): _*)
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
    runViaChangelog(agg, spark, Seq("term"), Seq("n")).orderBy("term")
  }

  /** Watermarked 1-hour tumbling-window counts by event type over the
    * events stream. Window starts emitted as epoch seconds for cross-engine
    * comparison.
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = spark.readStream.schema(EventsSchema)
      .parquet(s"$sfDir/events.parque?") // glob → basePath = the sf dir
    // Watermark sized for a BACKFILL: AvailableNow over historical files
    // gives no ordering guarantee across micro-batches, and in Update mode
    // the watermark genuinely DROPS rows older than (max ts − delay) seen
    // in earlier batches — a delay shorter than the source's full span
    // would lose events if the directory ever split into multiple batches
    // (single-file today, so any shorter delay only passes by accident).
    // A live deployment sets the delay to the source's real lateness bound,
    // trading state size for completeness; the batch-equality contract here
    // pins the completeness end of that trade.
    val agg = stream
      .withWatermark("ts", "3650 days")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    runViaChangelog(agg, spark, Seq("w", "event_type"), Seq("n", "sum_value"))
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
