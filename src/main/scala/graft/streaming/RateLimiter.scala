package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Per-key token-bucket rate limiting at ingest — the admission-control
  * primitive in front of every shared pipeline (cap events/sec per
  * tenant, per crawler host, per API key) that the reference world
  * delegates to broker quotas (Kafka's quota.producer.* — outside the
  * reference app itself).
  *
  * Event-time token bucket on `transformWithState`:
  *   - each key holds (tokens, lastRefillMs); tokens refill at
  *     `ratePerSec` up to `burst`,
  *   - refill is computed from EVENT TIME deltas, so replays are
  *     deterministic (the same input always admits the same rows —
  *     processing-time buckets can't be tested or resumed honestly),
  *   - an admitted row costs one token and is emitted with
  *     `admitted=true`; a dry bucket emits `admitted=false` (audit
  *     stream) so downstream can count drops per key.
  *
  * Out-of-order events within a batch are processed in event-time
  * order per key (the iterator is sorted before folding), so a replay
  * with the SAME micro-batch boundaries is bit-deterministic (the
  * kill/resume spec's contract). Determinism is per-batching, not
  * absolute: an out-of-order event that lands in a LATER batch is
  * folded after the earlier batch already consumed tokens, so a
  * replay that re-batches the same watermarked stream can admit a
  * different row at the margin — inherent to any online rate limiter
  * (admission depends on arrival, not just event time); a fully
  * replay-stable limiter must sort the whole horizon, i.e. be a batch
  * job.
  *
  * Scale: state is two numbers per key; the stream shuffles once on
  * the key (the same exchange any keyed operator needs). RocksDB
  * state store holds the long tail of idle keys; TTL would cap it
  * (left NONE here — the spec asserts exact admission counts).
  */
object RateLimiter {

  case class Ev(key: String, ts: Timestamp, payload: String)
  case class Decision(key: String, ts: Timestamp, payload: String, admitted: Boolean)
  case class Bucket(tokens: Double, lastMs: Long)

  class TokenBucketProcessor(ratePerSec: Double, burst: Double)
      extends StatefulProcessor[String, Ev, Decision] {
    @transient private var bucket: ValueState[Bucket] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bucket = getHandle.getValueState[Bucket](
        "bucket", Encoders.product[Bucket], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Decision] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.payload))
      var b = Option(bucket.get()).getOrElse(
        Bucket(burst, sorted.headOption.map(_.ts.getTime).getOrElse(0L)))
      val out = sorted.map { e =>
        val now = e.ts.getTime
        val elapsed = math.max(0L, now - b.lastMs)
        val refilled = math.min(burst, b.tokens + elapsed / 1000.0 * ratePerSec)
        val admit = refilled >= 1.0
        b = Bucket(if (admit) refilled - 1.0 else refilled, math.max(now, b.lastMs))
        Decision(e.key, e.ts, e.payload, admit)
      }
      bucket.update(b)
      out.iterator
    }
  }

  /** Rate-limit a keyed event stream: one decision row per input row. */
  def admit(spark: SparkSession, events: DataFrame, ratePerSec: Double,
            burst: Double, watermarkDelay: String = "1 minute"): Dataset[Decision] = {
    import spark.implicits._
    events.selectExpr("key", "ts", "payload").as[Ev]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(new TokenBucketProcessor(ratePerSec, burst),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
