package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Model
import graft.model.Model.IndicatorRow
import graft.streaming.IndicatorMath.BarState

/** The streaming query (SURVEY §3.2): Kafka-shaped JSON ticks → per-symbol
  * bounded state → per-tick indicator rows.
  *
  * Semantics replicated from the reference consumer:
  *  - ST1/ST2: keyed state = most recent 60 bars per symbol, count-based
  *    eviction (consumer.py:33,162-163) — durable here via checkpointing,
  *    an intentional improvement over the reference's process-lifetime
  *    state;
  *  - ST5: same-timestamp upsert is last-write-wins in state
  *    (consumer.py:160);
  *  - ST6 (documented deviation): state is kept TIME-SORTED on insert; the
  *    reference appends positionally and silently corrupts windows on late
  *    data;
  *  - F1/F5: malformed JSON / missing fields are dropped, never crash
  *    (producer.py:71-75, consumer.py:184-186);
  *  - F3/F4: no emission until 26 rows AND sma_20 is defined
  *    (consumer.py:165-173);
  *  - live path fakes OHLC from the tick price and leaves volume null ⇒
  *    mfi/obv/vwap null (consumer.py:124-127,153-159).
  *
  * Scale: state is O(symbols × 60 × 40B); the only shuffle is the keyed
  * exchange to the stateful operator. With Kafka partitioning by symbol
  * key (producer.py:89) the exchange is the sole data movement. Emission
  * carries `seq` (per-symbol counter) so the idempotent sink can apply
  * first-write-wins deterministically (ST4).
  *
  * Kafka binding (no broker in this environment, wiring documented):
  * `spark.readStream.format("kafka").option("subscribe", topic)
  * .option("startingOffsets","earliest").option("maxOffsetsPerTrigger",500)`
  * then `parse(df)` — the 500-record cap mirrors consumer.py:28.
  */
object StreamIngest {

  /** A parsed tick (timestamp epoch-ms, producer.py:81-86). */
  final case class TickEvent(symbol: String, price: Double, timestamp: Long)

  /** Output row + per-symbol emission sequence (sink ordering key). */
  final case class SeqRow(seq: Long, row: IndicatorRow)

  /** Keyed state: emission counter + time-sorted bounded frame. */
  final case class SymbolState(seq: Long, frame: Vector[BarState])

  /** value-string frame → typed ticks; malformed/incomplete dropped. */
  def parse(raw: DataFrame): Dataset[TickEvent] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(from_json(col("value"), Model.tickSchema).as("t"))
      .select(col("t.symbol"), col("t.price"), col("t.timestamp"))
      .filter(col("symbol").isNotNull && col("price").isNotNull && col("timestamp").isNotNull)
      .as[TickEvent]
  }

  /** Fold one symbol's micro-batch into its state, emitting gated rows.
    * Pure — shared by the streaming processor and unit tests. */
  private def foldTicks(symbol: String, st0: SymbolState,
      ticks: Iterator[TickEvent]): (SymbolState, Vector[SeqRow]) = {
    var st = st0
    val out = Vector.newBuilder[SeqRow]
    // Within a micro-batch, process in time order (deviation from the
    // reference's arrival order; see ST6 above).
    ticks.toVector.sortBy(_.timestamp).foreach { t =>
      val bar = BarState(t.timestamp, t.price, t.price, t.price, t.price, None)
      val (before, after) = st.frame.partition(_.time < t.timestamp)
      // last-write-wins on equal timestamp; insert keeps time order
      val merged = (before :+ bar) ++ after.dropWhile(_.time == t.timestamp)
      val frame = merged.takeRight(Model.LookbackRows)
      val seq = st.seq + 1
      st = SymbolState(seq, frame)
      if (frame.length >= Model.WarmupRows) {
        val row = IndicatorMath.latestRow(symbol, frame)
        if (row.sma_20.isDefined) out += SeqRow(seq, row)
      }
    }
    (st, out.result())
  }

  /** Spark 4 arbitrary-state processor (SURVEY §1.4): the successor to
    * flatMapGroupsWithState, running on the RocksDB state store — at scale
    * state lives off-heap per executor and checkpoints incrementally, so
    * symbol count is bounded by disk, not executor heap. */
  private class IndicatorProcessor
      extends StatefulProcessor[String, TickEvent, SeqRow] {
    @transient private var state: ValueState[SymbolState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SymbolState]("symbolState",
        Encoders.product[SymbolState], TTLConfig.NONE)

    override def handleInputRows(symbol: String, ticks: Iterator[TickEvent],
        timerValues: TimerValues): Iterator[SeqRow] = {
      val st0 = if (state.exists()) state.get() else SymbolState(0L, Vector.empty)
      val (st, out) = foldTicks(symbol, st0, ticks)
      state.update(st)
      out.iterator
    }
  }

  /** ticks → gated per-tick indicator rows (Append mode). Requires the
    * RocksDB state store provider (see [[rocksdbConf]]). */
  def pipeline(ticks: Dataset[TickEvent]): Dataset[SeqRow] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.symbol)
      .transformWithState(new IndicatorProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** transformWithState only runs on RocksDB — set this on any session that
    * starts the streaming query. */
  val rocksdbConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** In-stream replay dedup: drop repeats of the FULL tick payload
    * (symbol, timestamp, price) while the event is inside the watermark —
    * the streaming half of the reference's at-least-once contract. The
    * reference absorbs producer replays at the DATABASE (ON CONFLICT DO
    * NOTHING, consumer.py:200); dropping identical payloads upstream means
    * a replayed Kafka offset never re-enters the stateful indicator
    * operator at all. The key deliberately includes the price: a
    * same-timestamp tick with a NEW price is not a replay but an update,
    * which must reach the state for its last-write-wins upsert (ST5,
    * consumer.py:160) — only byte-identical re-deliveries are dropped.
    *
    * Scale: dedup state shares the symbol-keyed partitioning of the
    * indicator state downstream and is EVICTED at the watermark — bounded
    * by event-rate × delay, not by stream lifetime, which is what makes it
    * safe on an unbounded 100 TB/day feed. */
  def dedupWithinWatermark(ticks: Dataset[TickEvent],
      delay: String = "10 minutes"): Dataset[TickEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("symbol", "timestamp", "price")
      .drop("event_time")
      .as[TickEvent]
  }

  /** Full query: raw Kafka-shaped frame → parse → watermarked replay
    * dedup → stateful indicators. Replays are absorbed BEFORE the
    * indicator state, so a re-delivered offset never recomputes (the sink's
    * first-write-wins remains as the second, idempotency-of-last-resort
    * layer). */
  def fromRaw(raw: DataFrame, dedupDelay: String = "10 minutes"): Dataset[SeqRow] =
    pipeline(dedupWithinWatermark(parse(raw), dedupDelay))
}
