package graft.streaming

/** Kafka wiring constants lifted from the reference (documentation-as-code
  * for S3/S4; no broker exists in this environment, so these are consumed
  * by the format("kafka") calls shown in StreamIngest/Feeder scaladoc).
  *
  * Reference values:
  *  - topic "raw_stock_prices" (trading-etl-python/src/settings.py)
  *  - producer acks=1, JSON value, symbol key (producer.py:32-35,89)
  *  - consumer earliest offsets, group "indicator_calculators_v2",
  *    ≤500 records/poll (consumer.py:218-224, :28)
  */
object KafkaConfig {
  val Topic = "raw_stock_prices"
  val ConsumerGroup = "indicator_calculators_v2"
  val MaxRecordsPerTrigger = 500

  /** Options for `spark.readStream.format("kafka")`. */
  def sourceOptions(bootstrap: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> Topic,
    "startingOffsets" -> "earliest",
    "maxOffsetsPerTrigger" -> MaxRecordsPerTrigger.toString,
    "kafka.group.id" -> ConsumerGroup)

  /** Options for `df.write.format("kafka")` (producer.py acks=1). */
  def sinkOptions(bootstrap: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> Topic,
    "kafka.acks" -> "1")
}
