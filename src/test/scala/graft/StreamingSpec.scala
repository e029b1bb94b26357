package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, SessionUpdate}
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY.md §2.9): stateful sessionization over a
  * MemoryStream arrives in multiple micro-batches and the per-user state
  * must accumulate across them — the engine's replacement for the
  * reference's mutable visited-map + queue-driven workers.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("mapGroupsWithState sessionization accumulates across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val mem = MemoryStream[Event]
    val updates = StreamingOps.sessionize(mem.toDS())
    val q = updates.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("sessions")
      .start()

    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    mem.addData(Event(1, ts(0), 10, "view", 1.0), Event(2, ts(1), 10, "view", 2.0),
      Event(3, ts(1), 20, "buy", 5.0))
    q.processAllAvailable()
    mem.addData(Event(4, ts(2), 10, "buy", 3.0))
    q.processAllAvailable()
    q.stop()

    // last update per user wins
    val last = sp.table("sessions").as[SessionUpdate].collect()
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.last }.toMap
    assert(last(10L) == SessionUpdate(10L, 3L, 6.0))
    assert(last(20L) == SessionUpdate(20L, 1L, 5.0))
  }

  test("streamed term counts equal batch aggregation (exactly-once)") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamedTermCounts(sp, "/root/testdata/sf0.001")
    val batch = graft.ops.TextOps.documents(sp, "/root/testdata/sf0.001")
      .select(explode(graft.tokenize.Tokenizer.tokensCol(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy("term")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
