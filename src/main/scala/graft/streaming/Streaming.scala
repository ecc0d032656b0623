package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming form of the engine's incremental semantics
  * (SURVEY.md §2.8): the reference's metadata-driven monthly micro-batching
  * maps to a file-source stream; its high-watermark late-data policy (I3 —
  * rows at or before the watermark silently dropped) maps to
  * `withWatermark` + append-mode windowed aggregation.
  */
object Streaming {

  /** File-source micro-batch ingest (the streaming analog of the monthly
    * loader): one file per trigger mirrors one month per run. */
  def fileStream(spark: SparkSession, schema: StructType, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window aggregate with event-time watermark: counts + value
    * sum per (window, key). Late rows beyond `lateness` are dropped —
    * exactly the reference's I3 high-watermark policy. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total_value"))

  /** Session state for [[sessionize]]. */
  case class SessionAgg(userId: Long, nEvents: Long, totalValue: Double, closed: Boolean)
  case class Ev(user_id: Long, value: Double)

  /** Custom stateful operator via mapGroupsWithState: per-user running
    * session aggregate with processing-time timeout — the
    * KeyValueGroupedDataset state API the reference's control table
    * state machine maps onto. */
  def sessionize(events: Dataset[Ev], timeout: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionAgg, SessionAgg](GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.copy(closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionAgg(user, 0L, 0.0, closed = false))
            val batch = evs.toSeq
            val next = prev.copy(
              nEvents = prev.nEvents + batch.size,
              totalValue = prev.totalValue + batch.map(_.value).sum)
            state.update(next)
            state.setTimeoutDuration(timeout)
            next
          }
      }
  }
}
