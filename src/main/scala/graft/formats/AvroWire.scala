package graft.formats

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream

/**
 * Avro binary wire format with a schema-registry header, mirroring the
 * reference's Avro key/value converters
 * (cdcsdk-engine/src/main/java/com/yugabyte/cdcsdk/engine/ConvertingEngineBuilder.java:198-234
 * selects Avro/Apicurio/Confluent converter classes per key/value;
 * ServerApp.java:152-161 picks the format). Wire layout is the standard
 * registry framing: 1 magic byte (0x00) + 4-byte big-endian schema id +
 * Avro binary body.
 *
 * No spark-avro connector exists in this environment (only core
 * avro-1.12.1.jar), so the row<->bytes bridge is a per-partition
 * mapPartitions with writer/encoder reuse — serialization is inherently
 * per-record work, and the surrounding plan stays columnar/codegen'd.
 * Schemas ride OUTSIDE the records (in the registry), which is the entire
 * point of the format: the per-record overhead is 5 header bytes, not an
 * embedded schema.
 */
object AvroWire {

  val MAGIC: Byte = 0x00

  /** Recursive: nested structs become named records (record name = the
    * field path, so sibling nestings never collide), arrays become avro
    * arrays — the reference's converter serializes ANY Connect schema,
    * including the full nested {before, after, source} envelope
    * (ConvertingEngineBuilder.java:198-234; envelope shape
    * S3ConsumerIT.java:117-144). */
  private def avroType(dt: DataType, path: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case ShortType   => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case st: StructType => avroSchema(st, path)
    case ArrayType(et, containsNull) =>
      Schema.createArray(fieldSchema(et, containsNull, s"${path}_item"))
    case other => throw new IllegalArgumentException(s"unsupported avro field type $other")
  }

  /** nullable = union(null, T) at any nesting depth */
  private def fieldSchema(dt: DataType, nullable: Boolean, path: String): Schema =
    if (nullable)
      Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), avroType(dt, path)))
    else avroType(dt, path)

  /** Spark StructType -> Avro record schema (recursive; nullable fields are
    * union(null, T) with a null default). */
  def avroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, s"${name}_${f.name}"),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.Arrays.asList(fields: _*))
  }

  /** the non-null branch of a union(null, T), or the schema itself */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val it = s.getTypes.iterator()
      var r: Schema = null
      while (it.hasNext && r == null) {
        val t = it.next(); if (t.getType != Schema.Type.NULL) r = t
      }
      r
    } else s

  /** Spark value -> avro datum, recursively. The scalar mismatches vs
    * Spark's types: BYTES wants ByteBuffer (union resolution rejects
    * Array[Byte]) and INT wants Integer (Short fails instanceof Integer). */
  private def toDatum(v: Any, dt: DataType, schema: Schema): Any =
    if (v == null) null
    else dt match {
      case st: StructType =>
        val s = nonNull(schema)
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          rec.put(f.name,
            if (row.isNullAt(i)) null
            else toDatum(row.get(i), f.dataType, s.getField(f.name).schema()))
          i += 1
        }
        rec
      case ArrayType(et, _) =>
        val s = nonNull(schema)
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val list = new java.util.ArrayList[Any](seq.length)
        seq.foreach(e => list.add(toDatum(e, et, s.getElementType)))
        list
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ShortType  => Int.box(v.asInstanceOf[Short].toInt)
      case _          => v
    }

  /** avro datum -> Spark value, recursively (Utf8 -> String, ByteBuffer ->
    * Array[Byte], GenericRecord -> Row, avro array -> Seq). */
  private def fromDatum(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case rec: GenericRecord =>
      val st = dt.asInstanceOf[StructType]
      Row.fromSeq(st.fields.toIndexedSeq.map(f => fromDatum(rec.get(f.name), f.dataType)))
    case l: java.util.List[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val b = Seq.newBuilder[Any]
      l.forEach(e => b += fromDatum(e, et))
      b.result()
    case i: Integer if dt == ShortType => Short.box(i.shortValue())
    case _ => v
  }

  private def header(schemaId: Int): Array[Byte] =
    Array(MAGIC, (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte)

  def headerSchemaId(wire: Array[Byte]): Int = {
    require(wire.length >= 5 && wire(0) == MAGIC, "bad avro wire header")
    ((wire(1) & 0xff) << 24) | ((wire(2) & 0xff) << 16) | ((wire(3) & 0xff) << 8) | (wire(4) & 0xff)
  }

  /**
   * Serialize `payloadCols` of each row into an Avro `wire` binary column
   * (header + body); `keep` columns pass through. The Avro Schema is built
   * once per task from the (serializable) StructType — avro Schemas
   * themselves don't cross the driver/executor boundary.
   */
  def encode(df: DataFrame, payloadCols: Seq[String], schemaId: Int,
             keep: Seq[String] = Seq.empty): DataFrame = {
    val payloadType = StructType(payloadCols.map(c => df.schema(c)).toArray)
    val inSchema = StructType(keep.map(c => df.schema(c)) :+
      StructField("_payload", payloadType, nullable = false))
    val outSchema = StructType(keep.map(c => df.schema(c)) :+
      StructField("wire", BinaryType, nullable = false))
    val hdr = header(schemaId)
    df.select(keep.map(col) :+ struct(payloadCols.map(col): _*).as("_payload"): _*)
      .mapPartitions { rows =>
        val schema = avroSchema(payloadType, s"payload_v$schemaId")
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val bos = new ByteArrayOutputStream(256)
        var encoder = EncoderFactory.get().binaryEncoder(bos, null)
        rows.map { row =>
          val p = row.getStruct(row.length - 1)
          val rec = toDatum(p, payloadType, schema).asInstanceOf[GenericRecord]
          bos.reset()
          bos.write(hdr, 0, hdr.length)
          encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
          writer.write(rec, encoder)
          encoder.flush()
          Row.fromSeq(row.toSeq.dropRight(1) :+ bos.toByteArray)
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }

  /**
   * Decode a `wire` binary column back into flat payload columns; the
   * header's schema id selects the reader schema from `registry` (our event
   * schema registry), so records written at different schema versions decode
   * side by side.
   */
  def decode(df: DataFrame, registry: Map[Int, StructType], targetSchemaId: Int,
             keep: Seq[String] = Seq.empty): DataFrame = {
    val target = registry(targetSchemaId)
    val outSchema = StructType(keep.map(c => df.schema(c)).toArray ++ target.fields)
    df.select((keep.map(col) :+ col("wire")): _*)
      .mapPartitions { rows =>
        val schemas = scala.collection.mutable.Map.empty[Int, Schema]
        def schemaFor(id: Int): Schema =
          schemas.getOrElseUpdate(id, avroSchema(registry(id), s"payload_v$id"))
        val targetAvro = schemaFor(targetSchemaId)
        rows.map { row =>
          val wire = row.getAs[Array[Byte]](row.length - 1)
          val id = headerSchemaId(wire)
          // writer schema from the header, reader schema = target version
          // (Avro schema resolution fills added fields with defaults)
          val reader = new GenericDatumReader[GenericRecord](schemaFor(id), targetAvro)
          val decoder = DecoderFactory.get().binaryDecoder(wire, 5, wire.length - 5, null)
          val rec = reader.read(null, decoder)
          val vals = target.fields.map(f => fromDatum(rec.get(f.name), f.dataType))
          new GenericRowWithSchema(
            (row.toSeq.dropRight(1) ++ vals).toArray, outSchema): Row
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }
}
