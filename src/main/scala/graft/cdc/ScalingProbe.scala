package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-phase throughput at a given parallelism, to locate
  * scaling bottlenecks. Usage: ScalingProbe <threads> <numEvents> [root]. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val n = args(1).toLong
    val root = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("probe").toString

    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gen = GenConfig(numKeys = n / 5, hotKeys = 64, snapshotLsn = n / 10)
    val phases = sys.env.getOrElse("SPARK_GRAFT_PROBE_PHASES",
      "gen-only,gen+dedup,gen+dedup+bucket,dedup+parquet,full-epoch").split(",").toSet
    def time(label: String)(f: => Unit): Unit = if (phases.contains(label)) {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] threads=$threads $label%-18s ${s}%7.2fs  ${n / s}%9.0f ev/s")
    }

    time("gen-only")(
      EventGen.events(spark, 0, n, gen)
        .write.format("noop").mode("overwrite").save())
    time("gen+dedup")(
      Dedup.lastPerKey(EventGen.events(spark, 0, n, gen), Model.keyCols, "lsn")
        .write.format("noop").mode("overwrite").save())
    time("gen+dedup+bucket")(
      Dedup.lastPerKey(EventGen.events(spark, 0, n, gen), Model.keyCols, "lsn")
        .withColumn("bucket", pmod(hash(col("repo"), col("path")), lit(64)))
        .write.format("noop").mode("overwrite").save())
    time("dedup+parquet") {
      // mirror SnapshotTable.writerPartitioned: sub-bucket fan-out so a
      // bucket is not a single-task write
      val fanout = math.max(1, 2 * spark.sparkContext.defaultParallelism / 64)
      Dedup.lastPerKey(EventGen.events(spark, 0, n, gen), Model.keyCols, "lsn")
        .withColumn("bucket", pmod(hash(col("repo"), col("path")), lit(64)))
        .repartition(64 * fanout, col("bucket"),
          pmod(hash(Model.keyCols.map(col): _*), lit(fanout)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/probe-data")
    }
    time("full-epoch") {
      val table = new SnapshotTable(spark, s"$root/probe-table", 64)
      val engine = new CdcEngine(spark, table,
        EngineConfig(numBuckets = 64, broadcastThresholdBytes = 0))
      engine.applyEpoch(EventGen.events(spark, 0, n, gen), 0L)
    }
    spark.stop()
  }
}
