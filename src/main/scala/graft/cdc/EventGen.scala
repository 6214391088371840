package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic, splittable change-event generator.
 *
 * Modeled on the reference's deterministic test source
 * (cdcsdk-engine/src/main/java/io/debezium/connector/simple/SimpleSourceConnector.java:107-215
 * — same records in same order on every run, resume skips `id <= lastId`),
 * but built for 10^10 scale: every column is a pure function of the row index
 * (`spark.range`), so any LSN range can be (re)generated on any executor with
 * no state and no materialized input. This is what makes crash-replay and the
 * two-cluster-size scaling runs use byte-identical input.
 *
 * Skew: a configurable fraction of events lands on a small hot-key set that
 * maps to a handful of hot repos (Zipf-ish head), exercising the north rule's
 * salting / AQE-skew requirements.
 */
final case class GenConfig(
    numKeys: Long = 1L << 20,
    hotKeys: Long = 64,          // hot head of the key space
    hotFraction: Int = 20,       // percent of events hitting the hot head
    filesPerRepo: Long = 512,    // key -> (repo = key / filesPerRepo, path = key % filesPerRepo)
    snapshotLsn: Long = 0,       // events with lsn < snapshotLsn are op='r' (initial snapshot)
    deletePct: Int = 8,          // of non-snapshot events: % deletes
    insertPct: Int = 12,         // % explicit inserts ('c'); rest are updates ('u')
    seed: Long = 42L
)

object EventGen {

  private val langs = Array("scala", "java", "py", "go", "rs", "c", "cpp", "js")

  /** Change events for lsn in [lo, hi). Columns follow Model.eventSchemaV0.
    * `schemaId` is constant per call; the engine unions ranges generated at
    * different schema versions to exercise evolution. */
  def events(spark: SparkSession, lo: Long, hi: Long, cfg: GenConfig = GenConfig(),
             schemaId: Int = 0, numSlices: Int = 0): DataFrame = {
    val slices = if (numSlices > 0) numSlices else spark.sparkContext.defaultParallelism
    val base = spark.range(lo, hi, 1, slices).toDF("lsn")
    eventsFromLsns(base, cfg, schemaId)
  }

  /** Materialize full events for an arbitrary `lsn` column — the
    * "re-read the log by offset" primitive every real binlog/WAL source has.
    * Because every column is a pure function of lsn, the engine can dedup on
    * the (key, lsn) skeleton only and late-materialize winner payloads,
    * shuffling ~15% of the bytes (see CdcEngine late materialization). */
  def eventsFromLsns(lsns: DataFrame, cfg: GenConfig = GenConfig(),
                     schemaId: Int = 0): DataFrame = {
    val base = lsns
    val h = (salt: Int) => xxhash64(col("lsn"), lit(cfg.seed + salt))

    val isHot = pmod(h(1), lit(100)) < lit(cfg.hotFraction)
    val key = when(isHot, pmod(h(2), lit(cfg.hotKeys)))
      .otherwise(pmod(h(2), lit(cfg.numKeys)))
    val opRoll = pmod(h(3), lit(100))
    val op = when(col("lsn") < lit(cfg.snapshotLsn), lit("r"))
      .when(opRoll < lit(cfg.deletePct), lit("d"))
      .when(opRoll < lit(cfg.deletePct + cfg.insertPct), lit("c"))
      .otherwise(lit("u"))

    val repo = concat(lit("repo-"), (col("key") / lit(cfg.filesPerRepo)).cast("long"))
    val path = concat(lit("src/f"), pmod(col("key"), lit(cfg.filesPerRepo)), lit(".scala"))

    base
      .withColumn("key", key)
      .withColumn("op", op)
      .withColumn("repo", repo)
      .withColumn("path", path)
      // after-image columns are null on delete (Debezium: after == null for op='d')
      .withColumn("commit",
        when(col("op") === "d", lit(null: String))
          .otherwise(lpad(hex(h(4)), 16, "0")))
      .withColumn("lang",
        when(col("op") === "d", lit(null: String))
          .otherwise(element_at(lit(langs), (pmod(h(5), lit(langs.length)) + 1).cast("int"))))
      // the ~64-hex-char high-entropy body comes from four xxhash64 segments,
      // NOT sha2: Spark's Sha2 allocates a MessageDigest per row, and the r5
      // per-phase scaling attribution measured generation as the WORST-scaling
      // stage (0.57 eff 1->4 cores, an allocation-bandwidth ceiling) — the
      // synthetic source is scaffolding, not the engine under test, so it
      // should cost as little as a real log read/decode would. Same length
      // class, same compressibility (hex of independent 64-bit hashes), same
      // determinism (pure function of lsn+seed).
      .withColumn("content",
        when(col("op") === "d", lit(null: String))
          .otherwise(concat(
            lit("content:"), col("repo"), lit(":"), col("path"), lit(":lsn="), col("lsn"),
            lit(":"), hex(h(10)), hex(h(11)), hex(h(12)), hex(h(13)))))
      .withColumn("schemaId", lit(schemaId))
      .withColumn("ts_ms", lit(1704067200000L) + col("lsn") * lit(10L))
      .drop("key")
  }

  /** Key-skeleton for late-materialized dedup: only (key, lsn) as two longs
    * — no string construction at all. The per-key max-LSN winner is fully
    * determined by these two columns (the key id is a bijection with
    * (repo, path) inside the generator; a real source would use its primary
    * key / key-bytes column the same way). Phase-1 shuffle rows shrink to
    * 16 bytes and the aggregation is a pure primitive-type codegen loop. */
  def keySkeleton(spark: SparkSession, lo: Long, hi: Long, cfg: GenConfig = GenConfig(),
                  numSlices: Int = 0): DataFrame = {
    val slices = if (numSlices > 0) numSlices else spark.sparkContext.defaultParallelism
    val base = spark.range(lo, hi, 1, slices).toDF("lsn")
    val h = (salt: Int) => xxhash64(col("lsn"), lit(cfg.seed + salt))
    val isHot = pmod(h(1), lit(100)) < lit(cfg.hotFraction)
    val key = when(isHot, pmod(h(2), lit(cfg.hotKeys)))
      .otherwise(pmod(h(2), lit(cfg.numKeys)))
    base.withColumn("key", key)
  }

  /** The expected final table state ("reference final state") after replaying
    * lsn in [lo, hi): per-key last-wins by LSN, deletes remove the key. This is
    * the oracle the engine's materialized table is sha256-compared against. */
  def finalState(spark: SparkSession, lo: Long, hi: Long, cfg: GenConfig = GenConfig()): DataFrame = {
    val ev = events(spark, lo, hi, cfg)
    Dedup.lastPerKey(ev, Model.keyCols, "lsn")
      .filter(col("op") =!= "d")
      .select("repo", "path", "commit", "lang", "content")
  }
}
