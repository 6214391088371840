package graft.streaming

import graft.SparkTestBase
import graft.cdc.{EventGen, GenConfig, Model}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.expressions.Window

class SessionizerSpec extends SparkTestBase {
  import spark.implicits._

  private val gen = GenConfig(numKeys = 60, hotKeys = 8, filesPerRepo = 1)
  private val GAP = 2L // seconds; generator emits 1 event / 10 ms globally, ~0.6s per key

  /** closed sessions computed in batch (lag/sum window formulation): a
    * session is closed iff a later event for the key starts a new one. */
  private def batchClosedSessions(lo: Long, hi: Long) = {
    val byKey = Window.partitionBy($"key").orderBy($"tsSec", $"lsn")
    val all = EventGen.events(spark, lo, hi, gen)
      .select(col("repo").as("key"), (col("ts_ms") / 1000).cast("long").as("tsSec"), col("lsn"))
      .withColumn("prev", lag($"tsSec", 1).over(byKey))
      .withColumn("new_s", when($"prev".isNull || $"tsSec" - $"prev" > GAP, 1).otherwise(0))
      .withColumn("sess", sum($"new_s").over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
    val sessions = all.groupBy($"key", $"sess")
      .agg(min($"tsSec").as("startSec"), max($"tsSec").as("endSec"),
        count(lit(1)).as("n"), min($"lsn").as("firstLsn"), max($"lsn").as("lastLsn"),
        max($"sess").as("s"))
    val lastSess = sessions.groupBy($"key").agg(max($"sess").as("maxSess"))
    sessions.join(lastSess, "key").filter($"sess" < $"maxSess") // closed = not last
      .select("key", "startSec", "endSec", "n", "firstLsn", "lastLsn")
  }

  test("streaming flatMapGroupsWithState sessions == batch closed sessions") {
    val dir = tmpDir("sess")
    // write in LSN order so event time is non-decreasing across files
    (0 until 4).foreach { i =>
      EventGen.events(spark, i * 5000L, (i + 1) * 5000L, gen)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val stream = spark.readStream.schema(Model.eventSchemaV0)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(col("repo").as("key"), (col("ts_ms") / 1000).cast("long").as("tsSec"), col("lsn"))
      .as[Sessionizer.Event]
    val q = Sessionizer.sessionize(stream, GAP)(spark)
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.ProcessingTime(0L)).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sessions")
      .select("key", "startSec", "endSec", "n", "firstLsn", "lastLsn")
    val want = batchClosedSessions(0, 20000)
    val wc = want.count()
    assert(wc > 0, s"batch oracle must close some sessions (got $wc)")
    assert(streamed.count() > 0, "must close some sessions")
    assert(streamed.exceptAll(want).isEmpty && want.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${want.count()}")
  }

  test("sort-based sessionizer (spill-safe, O(1) per key) == window oracle") {
    val evs = EventGen.events(spark, 0, 20000, gen)
      .select(col("repo").as("key"), (col("ts_ms") / 1000).cast("long").as("tsSec"), col("lsn"))
      .as[Sessionizer.Event]
    val sorted = Sessionizer.sessionizeSorted(evs, GAP)(spark)
      .select("key", "startSec", "endSec", "n", "firstLsn", "lastLsn")
    val want = batchClosedSessions(0, 20000)
    assert(sorted.count() > 0)
    assert(sorted.exceptAll(want).isEmpty && want.exceptAll(sorted).isEmpty,
      s"sorted=${sorted.count()} batch=${want.count()}")
  }
}
