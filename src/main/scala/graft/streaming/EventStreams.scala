package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-shaped operators over the `events` table.
  *
  * The reference has no streaming surface (SURVEY.md §2.7 [ABSENT]); these
  * transforms are written against an unbounded DataFrame contract so the
  * same code serves `spark.read` (batch backfill, oracle-gated) and
  * `spark.readStream` (live path, exercised in the test suite via a
  * memory stream + watermark).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. `ts` must be a
    * TimestampType column; for streaming inputs, pass a watermark delay to
    * bound state. */
  def windowedStats(events: DataFrame, windowLen: String = "10 minutes",
                    watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(window(col("ts"), windowLen).as("w"), col("etype"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("etype"), col("n"),
        col("total"))
  }

  /** Per-user running event counts — the `mapGroupsWithState`-shaped
    * stateful op is introduced in the streaming spec; the batch-equivalent
    * here is a windowed cumulative count. */
  def userActivity(events: DataFrame): DataFrame =
    events.groupBy(col("userid"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("etype") === "error", 1).otherwise(0)).as("n_errors"),
        max(col("ts")).as("last_ts"))
}
