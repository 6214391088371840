package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

object RetrySpec {
  // transient-fault injector: the first evaluation in the JVM throws
  // (local mode: executors share the JVM, so the flag is visible)
  val faultArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
  def maybeFail(lsn: Long): Long = {
    if (faultArmed.compareAndSet(true, false))
      throw new java.io.IOException("transient source fault (injected)")
    lsn
  }
}

/** S4 retriable-error retry: a transient fault during an epoch's evaluation
  * is retried with the same epoch id; determinism + fencing keep the result
  * exactly-once (reference: RetriableException swallowed in the poll loop,
  * MTEngine.java:900-905). */
class RetrySpec extends SparkTestBase {

  private val gen = GenConfig(numKeys = 300, hotKeys = 4)

  private def flakyEvents(lo: Long, hi: Long) = {
    val flaky = udf(RetrySpec.maybeFail _)
    EventGen.events(spark, lo, hi, gen).withColumn("lsn", flaky(col("lsn")))
  }

  private def digests(df: org.apache.spark.sql.DataFrame) =
    df.select(col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))

  test("transient fault mid-epoch: retry converges to the oracle state") {
    val table = new SnapshotTable(spark, tmpDir("retry"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    engine.applyEpochWithRetry(flakyEvents(0, 3000), 0L)
    RetrySpec.faultArmed.set(true) // epoch 1 fails on its first attempt
    val n = engine.applyEpochWithRetry(flakyEvents(3000, 6000), 1L)
    assert(!RetrySpec.faultArmed.get, "fault must have fired")
    assert(n > 0, "retried epoch must apply")
    val want = digests(EventGen.finalState(spark, 0, 6000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("retries exhausted: the error propagates (no silent data loss)") {
    val table = new SnapshotTable(spark, tmpDir("retry2"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    RetrySpec.faultArmed.set(true)
    intercept[Exception] {
      engine.applyEpochWithRetry(flakyEvents(0, 3000), 0L, maxAttempts = 1)
    }
    RetrySpec.faultArmed.set(false)
    assert(table.loadManifest().isEmpty, "failed epoch must not commit anything")
    // the epoch re-applies cleanly afterwards (nothing half-committed)
    assert(engine.applyEpochWithRetry(flakyEvents(0, 3000), 0L) > 0)
  }
}
