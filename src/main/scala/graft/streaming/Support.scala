package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.model.Trade

/** Small fidelity pieces of the reference pipeline that are not operators:
  * ingest deserialization, output keying, observability, config layering
  * (SURVEY.md §2.1 R2, R12, R14, R15).
  */
object Support {

  /** R2 — JSON -> typed Trade rows (reference raw-producer main.rs:84-97
    * does a serde_json round-trip per trade). `from_json` + encoder; rows
    * failing the schema arrive as nulls (permissive), matching the
    * reference's per-message error handling rather than failing the batch.
    */
  def tradesFromJson(spark: SparkSession, jsonCol: Column, df: DataFrame): Dataset[Trade] = {
    import spark.implicits._
    df.select(from_json(jsonCol, Trade.schema).as("t")).select("t.*").as[Trade]
  }

  /** R12 — wall-clock epoch-millis string key for every output record
    * (reference lib.rs:29-36 get_current_ts). Non-deterministic by nature;
    * used only on sink paths, never in tested aggregates.
    *
    * PER-ROW, like the reference's per-message now(): Spark's
    * `current_timestamp()` is constant across a query execution, which
    * would give every record of a micro-batch ONE key — and kafka's
    * default key-hash partitioner would then funnel the whole batch into
    * a single partition (a produce hotspot at exactly the ingest volumes
    * the sink targets). The non-deterministic UDF stamps each row as it
    * is produced; rows within the same millisecond share a key, exactly
    * the reference's resolution.
    */
  private val nowMillis =
    udf(() => System.currentTimeMillis()).asNondeterministic()
  def wallClockKey(): Column = nowMillis().cast("string")

  /** R14 — the reference's Zipkin spans map to StreamingQueryListener
    * progress events in Spark: per-trigger rows/sec, batch duration and
    * state size, collected here for inspection or export.
    */
  final class ProgressCollector extends StreamingQueryListener {
    val progress = new ConcurrentLinkedQueue[StreamingQueryListener.QueryProgressEvent]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      progress.add(e)
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    def inputRows: Long = {
      var n = 0L
      progress.forEach(e => n += e.progress.numInputRows)
      n
    }
  }

  /** R15 — layered config mirroring the reference's TOML + env overlay
    * (config.rs:54-68): defaults overridden by `APP_`-prefixed environment
    * variables, e.g. APP_PERIOD_MINUTES. Engine knobs stay in spark.conf.
    */
  final case class PipelineConfig(
      periodMinutes: Int = 5, // config/agg-producer/config/default.toml:10
      watermark: String = "10 minutes",
      rawTopic: String = "trades-option-btc",
      aggTopic: String = "trades-option-btc-ewma-5min",
      startingOffsets: String = "latest") // default.toml:16

  object PipelineConfig {
    def fromEnv(env: Map[String, String] = sys.env): PipelineConfig = {
      val d = PipelineConfig()
      PipelineConfig(
        periodMinutes = env.get("APP_PERIOD_MINUTES").map(_.toInt).getOrElse(d.periodMinutes),
        watermark = env.getOrElse("APP_WATERMARK", d.watermark),
        rawTopic = env.getOrElse("APP_RAW_TOPIC", d.rawTopic),
        aggTopic = env.getOrElse("APP_AGG_TOPIC", d.aggTopic),
        startingOffsets = env.getOrElse("APP_STARTING_OFFSETS", d.startingOffsets))
    }
  }
}
