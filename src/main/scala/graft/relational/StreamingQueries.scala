package graft.relational

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.streaming.EventStreams

/** Batch twins of the streaming window analytics over `events` — the same
  * plans run under Structured Streaming with watermarks (see
  * EventStreamsSpec); here they execute in batch for the DuckDB oracle. */
object StreamingQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and convert by exact integer
    * division to microseconds (matching DuckDB's nanos->micros
    * truncation). */
  def events(s: org.apache.spark.sql.SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(t(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  val all: Seq[Q] = Seq(
    Q("events_tumbling", (s, dir) => {
      EventStreams.tumblingCounts(events(s, dir))
        .orderBy(col("window_start"), col("event_type"))
    }, Some(EventStreams.tumblingOracle)),

    Q("events_sliding", (s, dir) => {
      EventStreams.slidingCounts(events(s, dir))
        .orderBy(col("window_start"))
    }, Some(EventStreams.slidingOracle)),

    Q("events_sessions", (s, dir) => {
      EventStreams.sessionCounts(events(s, dir))
        .orderBy(col("user_id"), col("session_start"))
    }, Some(EventStreams.sessionOracle)),
  )
}
