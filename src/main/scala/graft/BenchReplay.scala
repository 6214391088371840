package graft

import org.apache.spark.sql.SparkSession
import graft.cdc.{CdcEngine, EngineConfig, GenConfig, SnapshotTable}

/**
 * Single-measurement child process for the scaling bench: one full
 * exactly-once replay at a given core count, printing one line
 * `RATE=<events/sec>`.
 *
 * Run as a separate JVM (Bench spawns it) so per-level resource limits are
 * REAL: a 2-core level gets 2 GC threads and 2 JIT compiler threads, the way
 * a 2-core executor on a cluster would — inside one shared 32-core JVM the
 * small level silently borrows the whole machine's GC/JIT parallelism and
 * the scaling ratio is distorted.
 */
object BenchReplay {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val numEvents = args(1).toLong
    val mode = if (args.length > 2) args(2) else "cow"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-replay-$cores")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_TMP", "/dev/shm")),
      s"bench-cdc-$cores").toString
    val gen = GenConfig(numKeys = math.max(1000L, numEvents / 5),
      hotKeys = 64, snapshotLsn = numEvents / 10)
    val table = new SnapshotTable(spark, root, numBuckets = 64, mode = mode)
    // broadcast threshold 0 (full-shuffle anti-join) is deliberate for the
    // SCALING bench: the broadcast key-set build is serial driver work — a
    // per-epoch constant that measured +15% at 1 core and ±0 at 4 cores
    // (interleaved 24M-event reps, r5), i.e. an Amdahl tax that grows with
    // parallelism. The engine's shipped default (256 MB threshold) remains
    // the right call on a real cluster where broadcast saves network; the
    // knob below lets a hand run measure either plan.
    val bcast = sys.env.get("SPARK_GRAFT_BCAST").map(_.toLong).getOrElse(0L)
    val engine = new CdcEngine(spark, table,
      EngineConfig(numBuckets = 64, broadcastThresholdBytes = bcast,
        deltaCache = sys.env.getOrElse("SPARK_GRAFT_DELTA_CACHE", "mem")))
    val t0 = System.nanoTime()
    engine.replayGenerated(0, numEvents, epochs = 2, gen)
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    println(f"RATE=${numEvents / secs}%.0f")
    spark.stop()
  }
}
