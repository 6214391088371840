package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium envelope codec: nested {before,after,source,op,ts_ms} JSON with
  * YB {value,set} cells (reference S3ConsumerIT.java:117-144,
  * ServerApp.java:167-178), decoded via from_json + normalization. */
class EnvelopeSpec extends SparkTestBase {
  import spark.implicits._

  private val keySchema = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType)))
  private val payloadSchema = StructType(Seq(
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType)))
  private val gen = GenConfig(numKeys = 800, hotKeys = 8)

  test("YB cell normalization: set=false or missing cell reads as NULL") {
    val wire = Seq((
      """{"repo":"r1","path":"p1"}""",
      """{"after":{"commit":{"value":"abc","set":true},
         |"lang":{"value":"scala","set":false}},
         |"source":{"lsn":7,"txId":0},"op":"u","ts_ms":1}""".stripMargin.replace("\n", "")
    )).toDF("key", "value")
    val r = Envelope.decodeJson(wire, keySchema, payloadSchema).collect()(0)
    assert(r.getAs[String]("repo") == "r1" && r.getAs[String]("path") == "p1")
    assert(r.getAs[Long]("lsn") == 7L && r.getAs[String]("op") == "u")
    assert(r.getAs[String]("commit") == "abc")
    assert(r.getAs[String]("lang") == null, "set=false cell must normalize to NULL")
    assert(r.getAs[String]("content") == null, "missing cell must normalize to NULL")
  }

  test("delete: null after image; key survives via the key document") {
    val ev = EventGen.events(spark, 0, 5000, gen)
    val deletes = Envelope.decodeJson(
        Envelope.wrapJson(ev), keySchema, payloadSchema)
      .filter(col("op") === "d")
    assert(deletes.count() > 0)
    assert(deletes.filter(col("repo").isNull || col("path").isNull).isEmpty)
    assert(deletes.filter(col("content").isNotNull).isEmpty)
  }

  test("wrap -> decode round trip is the identity on flat change events") {
    val ev = EventGen.events(spark, 0, 20000, gen)
    val cols = Seq("lsn", "op", "repo", "path", "commit", "lang", "content", "ts_ms")
    val back = Envelope.decodeJson(Envelope.wrapJson(ev), keySchema, payloadSchema)
      .select(cols.map(col): _*)
    val want = ev.select(cols.map(col): _*)
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
  }

  test("REPLICA IDENTITY FULL: before image round-trips on u/d, absent on c/r") {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy("repo", "path").orderBy("lsn")
    val ev = EventGen.events(spark, 0, 20000, gen)
      .withColumn("before_repo", lag(col("repo"), 1).over(byKey))
      .withColumn("before_path", lag(col("path"), 1).over(byKey))
      .withColumn("before_commit", lag(col("commit"), 1).over(byKey))
      .withColumn("before_lang", lag(col("lang"), 1).over(byKey))
      .withColumn("before_content", lag(col("content"), 1).over(byKey))
    val back = Envelope.decodeJson(
      Envelope.wrapJson(ev, replicaIdentityFull = true),
      keySchema, payloadSchema, withBefore = true)
    // u/d: before_* == the previous event's image for the key
    val want = ev.filter(col("op").isin("u", "d"))
      .select(col("lsn"), col("before_commit"), col("before_content"))
    val got = back.filter(col("op").isin("u", "d"))
      .select(col("lsn"), col("before_commit"), col("before_content"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // c/r: no before image at all
    assert(back.filter(!col("op").isin("u", "d"))
      .filter(col("before_commit").isNotNull || col("before_content").isNotNull)
      .isEmpty, "creates/reads must not carry a before image")
    // default (REPLICA IDENTITY DEFAULT) still omits before entirely
    val defaultWire = Envelope.wrapJson(ev).select("value").as[String].head()
    assert(!defaultWire.contains("\"before\":{"),
      "default replica identity must not emit a before image")
  }

  test("E2E: envelope-encoded stream replayed through the exactly-once MERGE sink") {
    val table = new SnapshotTable(spark, tmpDir("envsnap"), 4)
    val engine = new CdcEngine(spark, table, EngineConfig(numBuckets = 4))
    (0 until 4).foreach { i =>
      val wire = Envelope.wrapJson(EventGen.events(spark, i * 5000L, (i + 1) * 5000L, gen))
      val decoded = Envelope.decodeJson(wire, keySchema, payloadSchema)
        .withColumn("schemaId", lit(0)).drop("txId")
      engine.applyEpoch(decoded, i.toLong)
    }
    def digests(df: org.apache.spark.sql.DataFrame) =
      df.select(col("repo"), col("path"), sha2(coalesce(col("content"), lit("")), 256).as("sha"))
    val want = digests(EventGen.finalState(spark, 0, 20000, gen))
    val got = digests(table.read())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
