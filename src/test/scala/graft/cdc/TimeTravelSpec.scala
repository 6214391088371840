package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Time travel over the versioned-manifest commit log (Iceberg snapshot-read
  * semantics on the from-scratch table): every commit is a manifest version,
  * `readVersion` reads the table AS OF one, vacuum expires what the current
  * manifest no longer references and expired reads fail loudly. */
class TimeTravelSpec extends SparkTestBase {

  private val gen = GenConfig(numKeys = 800, hotKeys = 8)

  private def digests(df: org.apache.spark.sql.DataFrame) =
    df.select(col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))

  test("readVersion reproduces each committed epoch's state exactly") {
    val table = new SnapshotTable(spark, tmpDir("tt"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    // three single-epoch replays, each its own commit -> its own version
    val versionAfter = (1 to 3).map { i =>
      engine.replayGenerated((i - 1) * 10000L, i * 10000L, 1, gen)
      table.loadManifest().get.version
    }
    assert(versionAfter.distinct.size == 3, s"expected 3 distinct versions: $versionAfter")
    assert(table.retainedVersions().toSet.intersect(versionAfter.toSet) == versionAfter.toSet)
    versionAfter.zipWithIndex.foreach { case (v, i) =>
      val got = digests(table.readVersion(v))
      val want = digests(EventGen.finalState(spark, 0, (i + 1) * 10000L, gen))
      assert(got.count() == want.count(), s"version $v row count")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"version $v content")
    }
    // current read == newest version read
    val cur = digests(table.read()); val newest = digests(table.readVersion(versionAfter.last))
    assert(cur.exceptAll(newest).isEmpty && newest.exceptAll(cur).isEmpty)
  }

  test("time travel presents the HISTORICAL schema across evolution") {
    val table = new SnapshotTable(spark, tmpDir("ttSchema"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    engine.replayGenerated(0, 10000, 1, gen)
    val v0 = table.loadManifest().get.version
    // widen: apply an epoch carrying an extra column via schema evolution
    val withExtra = EventGen.events(spark, 10000, 20000, gen)
      .withColumn("stars", (col("lsn") % 7).cast("int"))
    engine.applyEpoch(withExtra, 1L)
    table.commitPending()
    val v1 = table.loadManifest().get.version
    assert(!table.readVersion(v0).columns.contains("stars"), "v0 predates the column")
    assert(table.readVersion(v1).columns.contains("stars"), "v1 carries the column")
  }

  test("vacuum expires unreferenced snapshots; expired reads fail loudly") {
    val table = new SnapshotTable(spark, tmpDir("ttVac"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    engine.replayGenerated(0, 10000, 1, gen)
    val old = table.loadManifest().get.version
    engine.replayGenerated(10000, 20000, 1, gen)
    val cur = table.loadManifest().get.version
    assert(table.readVersion(old).count() > 0, "pre-vacuum time travel works")
    assert(table.vacuum() > 0, "old CoW snapshot dirs should be reclaimed")
    val e = intercept[IllegalStateException](table.readVersion(old).count())
    assert(e.getMessage.contains("expired"), e.getMessage)
    // the current version is untouched
    assert(digests(table.readVersion(cur)).count() == digests(table.read()).count())
    // a version that never existed names the retained ones
    val iae = intercept[IllegalArgumentException](table.readVersion(999999L))
    assert(iae.getMessage.contains("retained"), iae.getMessage)
  }
}
