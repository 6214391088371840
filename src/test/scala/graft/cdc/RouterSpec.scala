package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multi-destination fan-out (StreamNameMapper + RegexRouter semantics):
  * a 2-destination stream lands in 2 tables, both oracle-equal, with
  * per-table fencing. */
class RouterSpec extends SparkTestBase {

  // filesPerRepo=16 => ~38 distinct repos, so both destinations get traffic
  private val gen = GenConfig(numKeys = 600, hotKeys = 8, filesPerRepo = 16)
  // RegexRouter-style destination: rewrite the repo name into a stream name,
  // then bucket streams into two physical tables by parity
  private def route = when(pmod(xxhash64(regexp_replace(col("repo"), "^repo-", "stream.")), lit(2)) === 0,
    "alpha").otherwise("beta")

  private def digests(df: org.apache.spark.sql.DataFrame) =
    df.select(col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))

  test("2-destination stream replays into 2 tables, both oracle-equal") {
    val router = new RoutingEngine(spark, tmpDir("route"), Seq("alpha", "beta"),
      EngineConfig(numBuckets = 4))
    (0 until 3).foreach { i =>
      val applied = router.applyEpoch(
        EventGen.events(spark, i * 4000L, (i + 1) * 4000L, gen), i.toLong, route)
      assert(applied.values.forall(_ > 0), s"epoch $i: $applied")
    }
    val oracle = EventGen.finalState(spark, 0, 12000, gen).withColumn("_d", route)
    Seq("alpha", "beta").foreach { d =>
      val want = digests(oracle.filter(col("_d") === d))
      val got = digests(router.table(d).read())
      assert(want.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"destination $d")
    }
  }

  test("fencing is per-table: re-delivered epoch is a no-op on every destination") {
    val router = new RoutingEngine(spark, tmpDir("routefence"), Seq("alpha", "beta"),
      EngineConfig(numBuckets = 4))
    val ev = EventGen.events(spark, 0, 4000, gen)
    val first = router.applyEpoch(ev, 0L, route)
    assert(first.values.forall(_ > 0))
    val redelivered = router.applyEpoch(ev, 0L, route)
    assert(redelivered.values.forall(_ == -1L), s"expected all fenced: $redelivered")
  }

  test("rows routing to an unlisted destination are dropped (filter-SMT)") {
    val router = new RoutingEngine(spark, tmpDir("routedrop"), Seq("alpha"),
      EngineConfig(numBuckets = 4))
    router.applyEpoch(EventGen.events(spark, 0, 4000, gen), 0L, route)
    val oracle = EventGen.finalState(spark, 0, 4000, gen).withColumn("_d", route)
    val want = digests(oracle.filter(col("_d") === "alpha"))
    val got = digests(router.table("alpha").read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
