package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The real Debezium change-event envelope: nested
 * `{before, after, source{version,connector,name,ts_ms,db,schema,table,txId,lsn}, op, ts_ms}`
 * JSON — documented verbatim in the reference's S3 integration test
 * (cdcsdk-server-s3/src/test/java/com/yugabyte/cdcsdk/sink/s3/S3ConsumerIT.java:117-144)
 * — plus the YugabyteDB variant where every column of the before/after image
 * is a per-column cell `{value, set}` that the server's
 * `YBExtractNewRecordState` transform normalizes before flattening
 * (cdcsdk-server-core/.../ServerApp.java:167-178).
 *
 * Spark-first: encode is `to_json(struct(...))`, decode is `from_json` with
 * an explicit envelope StructType followed by a pure-projection cell
 * normalization + flatten — all codegen'd expressions, no UDFs. The record
 * key travels as its own JSON document (Kafka-Connect key/value model).
 */
object Envelope {

  /** `source` block schema (S3ConsumerIT.java:122-137). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType, nullable = true),
    StructField("connector", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true),
    StructField("db", StringType, nullable = true),
    StructField("schema", StringType, nullable = true),
    StructField("table", StringType, nullable = true),
    StructField("txId", LongType, nullable = true),
    StructField("lsn", LongType, nullable = true)
  ))

  /** YB cell: `{value: <T>, set: bool}` per column. */
  private def cellType(dt: DataType): StructType = StructType(Seq(
    StructField("value", dt, nullable = true),
    StructField("set", BooleanType, nullable = true)))

  /** before/after image schema: plain Debezium (bare columns) or the YB
    * cell-wrapped variant. */
  def imageSchema(payload: StructType, ybCells: Boolean): StructType =
    if (!ybCells) StructType(payload.fields.map(_.copy(nullable = true)))
    else StructType(payload.fields.map(f =>
      StructField(f.name, cellType(f.dataType), nullable = true)))

  /** Full envelope schema for `from_json`. */
  def envelopeSchema(payload: StructType, ybCells: Boolean): StructType = {
    val img = imageSchema(payload, ybCells)
    StructType(Seq(
      StructField("before", img, nullable = true),
      StructField("after", img, nullable = true),
      StructField("source", sourceSchema, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("ts_ms", LongType, nullable = true)))
  }

  /** Build the after/before image column from bare payload columns; `prefix`
    * reads the source columns as `<prefix><name>` while keeping the envelope
    * field name bare (before images travel as before_* input columns). */
  private def image(payload: Seq[String], ybCells: Boolean, prefix: String = ""): Column = {
    val fields = payload.map { c =>
      val src = col(prefix + c)
      val v = if (ybCells) struct(src.as("value"), lit(true).as("set")) else src
      v.as(c)
    }
    struct(fields: _*)
  }

  /**
   * Wrap flat change events (Model.eventSchemaV0 shape) into Kafka-Connect
   * style (key-JSON, value-JSON) wire records. `after` is null on deletes
   * (Debezium: a delete's after image is null).
   *
   * `before` (reference envelope: S3ConsumerIT.java:117-144 documents the
   * `{before, after, source}` shape) is emitted only under
   * `replicaIdentityFull` — REPLICA IDENTITY FULL semantics: updates and
   * deletes carry the old row image, creates/reads don't. The old image is
   * read from `before_<col>` input columns (the engine's lag-per-key or the
   * source's WAL old-tuple, depending on the caller). The default remains
   * REPLICA IDENTITY DEFAULT: no before image at all.
   */
  def wrapJson(events: DataFrame, keyCols: Seq[String] = Model.keyCols,
               payloadCols: Seq[String] = Model.payloadCols,
               ybCells: Boolean = true, table: String = "repo_files",
               replicaIdentityFull: Boolean = false): DataFrame =
    events.select(
      to_json(struct(keyCols.map(col): _*)).as("key"),
      to_json(envelopeStruct(events, keyCols, payloadCols, ybCells, table,
        replicaIdentityFull)).as("value"))

  /** The envelope as a nested STRUCT column (the shape the Avro/Proto
    * converters serialize directly — a registry-Kafka deployment running
    * WITHOUT the FLATTEN transform ships exactly this nesting on the wire,
    * ConvertingEngineBuilder.java:198-234). `wrapJson` is its to_json
    * rendering. */
  def envelopeStruct(events: DataFrame, keyCols: Seq[String] = Model.keyCols,
                     payloadCols: Seq[String] = Model.payloadCols,
                     ybCells: Boolean = true, table: String = "repo_files",
                     replicaIdentityFull: Boolean = false): Column = {
    val payload = keyCols ++ payloadCols
    val imgType = imageSchema(
      StructType(payload.map(c => events.schema(c).copy(nullable = true))), ybCells)
    val beforeImg =
      if (!replicaIdentityFull) lit(null).cast(imgType)
      else when(col("op").isin("u", "d"), image(payload, ybCells, prefix = "before_"))
        .otherwise(lit(null).cast(imgType))
    struct(
      beforeImg.as("before"),
      when(col("op") === "d", lit(null).cast(imgType))
        .otherwise(image(payload, ybCells)).as("after"),
      struct(
        lit("1.9.5.y.220").as("version"),
        lit("yugabytedb").as("connector"),
        lit("graft").as("name"),
        col("ts_ms").as("ts_ms"),
        lit("yugabyte").as("db"),
        lit("public").as("schema"),
        lit(table).as("table"),
        (col("lsn") / 16).cast("long").as("txId"),
        col("lsn").as("lsn")).as("source"),
      col("op").as("op"),
      col("ts_ms").as("ts_ms"))
  }

  /**
   * Decode wire records back to flat change events: `from_json` of key +
   * envelope, YB `{value,set}` cell normalization (a cell whose `set` is not
   * true reads as NULL — YBExtractNewRecordState semantics), then the
   * FLATTEN/ExtractNewRecordState projection. Keys come from the key
   * document (a delete's after image is null), lsn/txId from `source`.
   *
   * `withBefore` additionally exposes the old row image as `before_<col>`
   * columns (REPLICA IDENTITY FULL consumers: old-value auditing/diffing) —
   * null for creates/reads, the before cells for updates/deletes.
   */
  def decodeJson(wire: DataFrame, keySchema: StructType, payload: StructType,
                 ybCells: Boolean = true, withBefore: Boolean = false): DataFrame = {
    // parse each document ONCE into an intermediate column: projecting the
    // fields straight off from_json(...) would plant a fresh parse inside
    // EVERY output column (CollapseProject duplicates the expression — this
    // was a measured 3x slowdown on the decode path); with a multi-referenced
    // non-cheap intermediate, Catalyst keeps the single parse
    val parsed = wire
      .withColumn("_env", from_json(col("value"), envelopeSchema(payload, ybCells)))
      .withColumn("_key", from_json(col("key"), keySchema))
    val env = col("_env")
    val key = col("_key")
    def field(img: Column, f: StructField): Column =
      if (ybCells) when(img(f.name)("set") === true, img(f.name)("value"))
      else img(f.name)
    val payloadCols = payload.fields.toSeq.map(f => field(env("after"), f).as(f.name))
    val beforeCols =
      if (!withBefore) Seq.empty
      else payload.fields.toSeq.map(f => field(env("before"), f).as(s"before_${f.name}"))
    val keyColumns = keySchema.fieldNames.toSeq.map(n => key(n).as(n))
    parsed.select(
      (env("source")("lsn").as("lsn") +:
        env("op").as("op") +:
        keyColumns) ++
      payloadCols ++ beforeCols :+
      env("source")("txId").as("txId") :+
      env("ts_ms").as("ts_ms"): _*)
  }
}
