package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(lsn: Long, op: String, repo: String, path: String, content: String) =
    Model.ChangeEvent(lsn, op, repo, path, s"c$lsn", "scala", content, 0, lsn * 10)

  test("lastPerKey keeps the max-LSN event per key") {
    val df = Seq(
      ev(1, "c", "r1", "a", "v1"),
      ev(5, "u", "r1", "a", "v5"),
      ev(3, "u", "r1", "a", "v3"),
      ev(2, "c", "r2", "b", "w2"),
      ev(4, "d", "r2", "b", null)
    ).toDS.toDF
    val got = Dedup.lastPerKey(df, Seq("repo", "path"), "lsn")
      .select("repo", "path", "lsn", "op", "content")
      .as[(String, String, Long, String, String)].collect().toSet
    assert(got == Set(("r1", "a", 5L, "u", "v5"), ("r2", "b", 4L, "d", null)))
  }

  test("all three variants agree on generated events") {
    val events = EventGen.events(spark, 0, 20000, GenConfig(numKeys = 500, hotKeys = 8))
    val a = Dedup.lastPerKey(events, Model.keyCols, "lsn")
    val b = Dedup.lastPerKeyWindow(events, Model.keyCols, "lsn")
    val c = Dedup.saltedLastPerKey(events, Model.keyCols, "lsn", salts = 16)
    val cols = Seq("repo", "path", "lsn", "op", "commit", "lang", "content")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).orderBy("repo", "path")
    assert(canon(a).exceptAll(canon(b)).isEmpty && canon(b).exceptAll(canon(a)).isEmpty)
    assert(canon(a).exceptAll(canon(c)).isEmpty && canon(c).exceptAll(canon(a)).isEmpty)
    // every key appears exactly once
    val n = a.groupBy("repo", "path").count().filter($"count" > 1).count()
    assert(n == 0)
  }

  test("generator is deterministic and LSN-unique") {
    val e1 = EventGen.events(spark, 100, 1100)
    // a different slicing must produce the same rows (splittable purity)
    val e2 = EventGen.events(spark, 100, 1100, numSlices = 3)
    assert(e1.count() == 1000 && e1.select("lsn").distinct().count() == 1000)
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty)
    // op mix sanity: all of c/u/d present, snapshot phase emits r
    val ops = e1.select("op").distinct().as[String].collect().toSet
    assert(Set("c", "u", "d").subsetOf(ops))
    val snap = EventGen.events(spark, 0, 100, GenConfig(snapshotLsn = 100))
    assert(snap.select("op").distinct().as[String].collect().toSet == Set("r"))
  }
}
