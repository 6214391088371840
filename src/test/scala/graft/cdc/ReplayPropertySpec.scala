package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: for ANY interleaving of c/u/d/r ops across keys, replaying
  * through the engine (in any epoch chunking) equals a sequential in-memory
  * last-writer-wins oracle. Mirrors the reference's exact-map-equality
  * property tests (AbstractIncrementalSnapshotTest.java:171-198). */
class ReplayPropertySpec extends SparkTestBase {
  import spark.implicits._

  import ReplayPropertySpec.Ev

  private val opGen = Gen.frequency(3 -> "c", 5 -> "u", 2 -> "d", 1 -> "r")

  private val eventsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(20, 300)
    keys <- Gen.choose(2, 12)
    ops <- Gen.listOfN(n, for {
      k <- Gen.choose(0, keys - 1)
      op <- opGen
      body <- Gen.alphaStr.map(_.take(8))
    } yield (k, op, body))
  } yield ops.zipWithIndex.map { case ((k, op, body), i) =>
    Ev(i.toLong, op, s"r${k % 3}", s"p$k",
      if (op == "d") null else s"v$i:$body")
  }

  private def oracle(evs: List[Ev]): Map[(String, String), String] =
    evs.sortBy(_.lsn).foldLeft(Map.empty[(String, String), String]) { (m, e) =>
      if (e.op == "d") m - ((e.repo, e.path)) else m + ((e.repo, e.path) -> e.content)
    }

  test("engine final state == sequential oracle for random interleavings") {
    (1L to 8L).foreach { seedN =>
      val evs = eventsGen.apply(Gen.Parameters.default, Seed(seedN))
        .getOrElse(fail(s"gen failed for seed $seedN"))
      val root = tmpDir("prop")
      val table = new SnapshotTable(spark, root, numBuckets = 3)
      val engine = new CdcEngine(spark, table)
      val df = evs.toDF()
        .withColumn("commit", lit("c")).withColumn("lang", lit("x"))
        .withColumn("schemaId", lit(0)).withColumn("ts_ms", col("lsn"))
      // epoch chunking at the lsn midpoint
      val mid = evs.map(_.lsn).max / 2
      engine.applyEpoch(df.filter(col("lsn") <= mid), 0L)
      engine.applyEpoch(df.filter(col("lsn") > mid), 1L)

      val got = table.read().select("repo", "path", "content")
        .as[(String, String, String)].collect()
        .map { case (r, p, c) => (r, p) -> c }.toMap
      assert(got == oracle(evs), s"mismatch for seed $seedN")
    }
  }

  test("routing property: per-destination final states partition the oracle") {
    (10L to 14L).foreach { seedN =>
      val evs = eventsGen.apply(Gen.Parameters.default, Seed(seedN))
        .getOrElse(fail(s"gen failed for seed $seedN"))
      val router = new RoutingEngine(spark, tmpDir("routeprop"),
        Seq("alpha", "beta"), EngineConfig(numBuckets = 2))
      val route = when(col("repo") === "r0", "alpha").otherwise("beta")
      val df = evs.toDF()
        .withColumn("commit", lit("c")).withColumn("lang", lit("x"))
        .withColumn("schemaId", lit(0)).withColumn("ts_ms", col("lsn"))
      val mid = evs.map(_.lsn).max / 2
      router.applyEpoch(df.filter(col("lsn") <= mid), 0L, route)
      router.applyEpoch(df.filter(col("lsn") > mid), 1L, route)
      val want = oracle(evs)
      def state(d: String) = router.table(d).read()
        .select("repo", "path", "content").as[(String, String, String)]
        .collect().map { case (r, p, c) => (r, p) -> c }.toMap
      assert(state("alpha") == want.filter(_._1._1 == "r0"), s"alpha seed $seedN")
      assert(state("beta") == want.filter(_._1._1 != "r0"), s"beta seed $seedN")
    }
  }

  test("envelope round trip property: wire encode/decode preserves the oracle") {
    (20L to 23L).foreach { seedN =>
      val evs = eventsGen.apply(Gen.Parameters.default, Seed(seedN))
        .getOrElse(fail(s"gen failed for seed $seedN"))
      val table = new SnapshotTable(spark, tmpDir("envprop"), numBuckets = 2)
      val engine = new CdcEngine(spark, table)
      val df = evs.toDF()
        .withColumn("commit", lit("c")).withColumn("lang", lit("x"))
        .withColumn("schemaId", lit(0)).withColumn("ts_ms", col("lsn"))
      val keySchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("repo", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType)))
      val payloadSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("commit", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.StringType)))
      val decoded = Envelope.decodeJson(Envelope.wrapJson(df), keySchema, payloadSchema)
        .withColumn("schemaId", lit(0)).drop("txId")
      engine.applyEpoch(decoded, 0L)
      val got = table.read().select("repo", "path", "content")
        .as[(String, String, String)].collect()
        .map { case (r, p, c) => (r, p) -> c }.toMap
      assert(got == oracle(evs), s"mismatch for seed $seedN")
    }
  }
}

object ReplayPropertySpec {
  case class Ev(lsn: Long, op: String, repo: String, path: String, content: String)
}
