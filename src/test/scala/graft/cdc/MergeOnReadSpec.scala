package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Merge-on-read table mode: delta stacking, reconciliation, compaction. */
class MergeOnReadSpec extends SparkTestBase {

  private val gen = GenConfig(numKeys = 1500, hotKeys = 16)

  private def digests(df: org.apache.spark.sql.DataFrame) =
    df.select(col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))

  private def assertOracle(table: SnapshotTable, lo: Long, hi: Long): Unit = {
    val got = digests(table.read())
    val want = digests(EventGen.finalState(spark, lo, hi, gen))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("MOR replay == oracle == CoW replay; deltas stack between compactions") {
    val mor = new SnapshotTable(spark, tmpDir("mor"), 4, mode = "mor", compactionThreshold = 99)
    val cow = new SnapshotTable(spark, tmpDir("cow"), 4, mode = "cow")
    new CdcEngine(spark, mor, EngineConfig(numBuckets = 4)).replayGenerated(0, 40000, 4, gen)
    new CdcEngine(spark, cow, EngineConfig(numBuckets = 4)).replayGenerated(0, 40000, 4, gen)
    // every epoch stacked a delta (threshold 99 -> no compaction)
    val m = mor.loadManifest().get
    assert(m.buckets.values.exists(_.deltas.size >= 3), "deltas should stack")
    assertOracle(mor, 0, 40000)
    val a = digests(mor.read()); val b = digests(cow.read())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("auto-compaction folds deltas into a new base, state unchanged") {
    val mor = new SnapshotTable(spark, tmpDir("morC"), 4, mode = "mor", compactionThreshold = 2)
    new CdcEngine(spark, mor, EngineConfig(numBuckets = 4)).replayGenerated(0, 40000, 5, gen)
    val m = mor.loadManifest().get
    assert(m.buckets.values.forall(_.deltas.size <= 2),
      s"deltas after auto-compaction: ${m.buckets.values.map(_.deltas.size).toSeq.sorted}")
    assert(m.buckets.values.exists(_.dir.startsWith("data/compact-")))
    assertOracle(mor, 0, 40000)
  }

  test("explicit compact + vacuum keep the reconciled state byte-identical") {
    val mor = new SnapshotTable(spark, tmpDir("morV"), 4, mode = "mor", compactionThreshold = 99)
    new CdcEngine(spark, mor, EngineConfig(numBuckets = 4)).replayGenerated(0, 30000, 3, gen)
    val before = digests(mor.read()).collect().toSet
    mor.compact()
    assert(mor.loadManifest().get.buckets.values.forall(_.deltas.isEmpty))
    val removed = mor.vacuum()
    assert(removed > 0, "old delta dirs should be vacuumed")
    val after = digests(mor.read()).collect().toSet
    assert(before == after)
  }

  test("MOR fencing: re-delivered epoch does not double-stack deltas") {
    val mor = new SnapshotTable(spark, tmpDir("morF"), 4, mode = "mor", compactionThreshold = 99)
    val engine = new CdcEngine(spark, mor, EngineConfig(numBuckets = 4))
    engine.replayGenerated(0, 20000, 2, gen)
    val sizes = mor.loadManifest().get.buckets.values.map(_.deltas.size).toSeq.sorted
    val n = engine.applyEpoch(EventGen.events(spark, 0, 10000, gen), 0L)
    assert(n == -1L)
    assert(mor.loadManifest().get.buckets.values.map(_.deltas.size).toSeq.sorted == sizes)
    assertOracle(mor, 0, 20000)
  }
}
