package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing for streams — the extension surface beyond the
  * reference (which is processing-time only, SURVEY T8; these builders
  * are used by the `events`-style extension pipelines, never by the
  * census parity path).
  *
  * Both builders take the watermark delay explicitly: on an unbounded
  * stream the watermark is what lets Spark finalize windows and evict
  * state — without it, state grows forever. In batch mode the same
  * lineage runs with the watermark ignored, which is how the DuckDB
  * oracle checks the window arithmetic (EventQueries).
  */
object EventTimeWindows {

  /** Tumbling event-time counts/averages with watermarking. Append-mode
    * compatible: a window emits once its end passes the watermark.
    */
  def tumbling(df: DataFrame, tsCol: String, valueCol: String,
      duration: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration))
      .agg(count(lit(1)).as("cnt"), avg(col(valueCol)).as("avg_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("cnt"), col("avg_value"))

  /** Per-key session windows (gap-merged) with watermarking; the
    * session closes `gap` after its last event.
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("cnt"))
}
