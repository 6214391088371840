package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming windowed aggregation with watermark over the change
  * stream (event-time metrics: the streaming analogue of the reference's
  * Prometheus counters), verified against the batch equivalent. */
class StreamingWindowSpec extends SparkTestBase {

  test("watermarked tumbling-window counts match the batch computation") {
    val dir = tmpDir("swin")
    EventGen.events(spark, 0, 20000, GenConfig(numKeys = 200))
      .coalesce(2).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Model.eventSchemaV0)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("op"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.sql(
      "SELECT window.start AS ws, op, n, max_lsn FROM win_counts")
    val batch = EventGen.events(spark, 0, 20000, GenConfig(numKeys = 200))
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .groupBy(window(col("event_time"), "5 minutes").as("w"), col("op"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))
      .select(col("w.start").as("ws"), col("op"), col("n"), col("max_lsn"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming windowed counts must equal batch")
  }
}
