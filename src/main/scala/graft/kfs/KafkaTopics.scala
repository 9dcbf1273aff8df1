package graft.kfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LIVE Kafka topics as the same 8-implicit-column frame the KFS scan
  * produces — so every operator in the engine (KAFSQL planner, dedup,
  * streaming aggregates, the ETL pipeline) runs unchanged against a real
  * broker. This mirrors the reference's own Spark integration demo
  * (`examples/E40_spark-kafscale-demo/README.md:20-46`), which connects
  * Structured Streaming to a KafScale broker through the standard Kafka
  * wire protocol.
  *
  * Uses `format("kafka")` by name, so this compiles with no Kafka jars on
  * the classpath; at runtime Spark resolves the provider from
  * spark-sql-kafka when present and fails with a clear "failed to find
  * data source" otherwise ([[available]] lets callers/tests gate cleanly
  * — this container ships no Kafka jars, so the smoke test self-skips).
  *
  * Column mapping (Kafka source schema → SURVEY §1.2 implicit columns):
  * topic/partition/offset/timestamp map directly; `_ts` is the broker
  * timestamp as NTZ micros with an `_ts_ms` epoch-ms twin; key/value stay
  * binary; headers (requires `includeHeaders`) collapse duplicate keys
  * via map_from_entries — the reference's JSON-object rendering loses
  * duplicates the same way (`server.go:2810-2828`). `_segment` is
  * synthesized from (topic, partition) since a live fetch has no backing
  * object.
  */
object KafkaTopics {

  /** Is a Kafka DSv2 provider on the classpath? */
  def available: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  private def toImplicitColumns(df: DataFrame): DataFrame =
    df.select(
      col("topic").as("_topic"),
      col("partition").as("_partition"),
      col("offset").as("_offset"),
      col("timestamp").cast("timestamp_ntz").as("_ts"),
      unix_micros(col("timestamp")).divide(1000L).cast("long").as("_ts_ms"),
      col("key").as("_key"),
      col("value").as("_value"),
      map_from_entries(transform(col("headers"),
        h => struct(h.getField("key"),
          h.getField("value").cast("string")))).as("_headers"),
      concat(col("topic"), lit("/"), col("partition").cast("string"),
        lit("/live")).as("_segment"))

  /** Continuous consumption: `readStream.format("kafka")` with the
    * implicit-column projection — plug into any streaming operator. */
  def readStream(spark: SparkSession, bootstrapServers: String,
      topics: Seq[String], startingOffsets: String = "earliest"): DataFrame =
    toImplicitColumns(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
      .load())

  /** Bounded batch read of a live topic (offset ranges via the source's
    * own starting/endingOffsets options). */
  def read(spark: SparkSession, bootstrapServers: String,
      topics: Seq[String], startingOffsets: String = "earliest",
      endingOffsets: String = "latest"): DataFrame =
    toImplicitColumns(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .option("includeHeaders", "true")
      .load())
}
