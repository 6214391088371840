package graft.formats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Format selection (reference F2: `cdcsdk.server.format.{key,value}` picks
 * Json / Avro / Protobuf / CloudEvents per key/value — ServerApp.java:152-161,
 * converter instantiation ConvertingEngineBuilder.java:198-234). Here one
 * config string selects the serializer applied at the sink boundary.
 */
object WireFormat {

  val Json = "json"
  val Avro = "avro"
  val Proto = "proto"
  val CloudEvents = "cloudevents"

  /** CloudEvents 1.0 JSON envelope around the payload struct (deterministic:
    * id = source-assigned lsn, no UUIDs — SURVEY §7.3). Pure expression. */
  def cloudEvents(payload: Column, id: Column, eventType: String,
                  source: String = "/graft/cdc"): Column =
    to_json(struct(
      lit("1.0").as("specversion"),
      id.cast("string").as("id"),
      lit(source).as("source"),
      lit(eventType).as("type"),
      lit("application/json").as("datacontenttype"),
      payload.as("data")))

  /**
   * Serialize `payloadCols` of `df` per the selected format into a `wire`
   * column (string for json/cloudevents, binary for avro/proto), keeping
   * `keep` columns. The JSON path is a pure codegen'd expression; the binary
   * formats are per-partition encoders (see AvroWire/ProtoWire).
   *
   * `idCol` feeds the CloudEvents `id` attribute (1.0 spec: unique per
   * source) — the source-assigned LSN by default, never a payload column
   * picked by position.
   */
  def encode(df: DataFrame, format: String, payloadCols: Seq[String], schemaId: Int,
             keep: Seq[String] = Seq.empty, idCol: String = "lsn"): DataFrame = format match {
    case Json =>
      df.select(keep.map(col) :+
        to_json(struct(payloadCols.map(col): _*)).as("wire"): _*)
    case CloudEvents =>
      df.select(keep.map(col) :+
        cloudEvents(struct(payloadCols.map(col): _*), col(idCol),
          "graft.cdc.change").as("wire"): _*)
    case Avro  => AvroWire.encode(df, payloadCols, schemaId, keep)
    case Proto => ProtoWire.encode(df, payloadCols, schemaId, keep)
    case other => throw new IllegalArgumentException(s"unknown wire format $other")
  }

  /** Deserialize a `wire` column back to flat payload columns. */
  def decode(df: DataFrame, format: String, registry: Map[Int, StructType],
             schemaId: Int, keep: Seq[String] = Seq.empty): DataFrame = format match {
    case Json =>
      val target = registry(schemaId)
      df.select(keep.map(col) :+ from_json(col("wire"), target).as("_p"): _*)
        .select(keep.map(col) ++ target.fieldNames.map(n => col(s"_p.$n")): _*)
    case CloudEvents =>
      val target = registry(schemaId)
      val env = StructType(Seq(
        org.apache.spark.sql.types.StructField("data", target)))
      df.select(keep.map(col) :+ from_json(col("wire"), env).as("_e"): _*)
        .select(keep.map(col) ++ target.fieldNames.map(n => col(s"_e.data.$n")): _*)
    case Avro  => AvroWire.decode(df, registry, schemaId, keep)
    case Proto => ProtoWire.decode(df, registry, schemaId, keep)
    case other => throw new IllegalArgumentException(s"unknown wire format $other")
  }
}

/**
 * Append-only wire sink: the Spark equivalent of the reference's S3 jsonl
 * sink (S3ChangeConsumer.java:123-150 — serialize each record's value, roll
 * files by size; insert-only, single logical stream), generalized over the
 * four wire formats. Text files for string formats, parquet-with-binary for
 * avro/proto; file sizing via maxRecordsPerFile (the Roller/flush.records
 * equivalent, StorageSinkConnectorConfig.java:31-38).
 */
class WireSink(spark: SparkSession, root: String, format: String,
               maxRecordsPerFile: Long = 0L) {

  def epochDir(epochId: Long): String = f"$root/epoch=$epochId"

  /** Write one epoch of serialized records; returns the records written
    * (observed on the write job itself — no second evaluation of the
    * source pipeline). */
  def writeEpoch(events: DataFrame, epochId: Long, payloadCols: Seq[String],
                 schemaId: Int = 0): Long = {
    val obs = org.apache.spark.sql.Observation(s"wire-epoch-$epochId")
    val wire = WireFormat.encode(events, format, payloadCols, schemaId)
      .observe(obs, count(lit(1)).as("rows"))
    val writer = wire.write.mode("overwrite")
    val sized = if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile) else writer
    format match {
      case WireFormat.Json | WireFormat.CloudEvents => sized.text(epochDir(epochId))
      case _                                        => sized.parquet(epochDir(epochId))
    }
    obs.get("rows").asInstanceOf[Long]
  }

  /** Read an epoch back to flat payload columns (round-trip check path). */
  def readEpoch(epochId: Long, registry: Map[Int, StructType], schemaId: Int): DataFrame = {
    val raw = format match {
      case WireFormat.Json | WireFormat.CloudEvents =>
        spark.read.text(epochDir(epochId)).withColumnRenamed("value", "wire")
      case _ => spark.read.parquet(epochDir(epochId))
    }
    WireFormat.decode(raw, format, registry, schemaId)
  }
}
