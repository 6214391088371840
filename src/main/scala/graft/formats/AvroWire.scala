package graft.formats

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
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
 * registry framing: 1 magic byte (0x00), then the schema id per the
 * selected [[RegistryFraming]] (Confluent 4-byte int, the default, or
 * Apicurio 8-byte globalId), then the Avro binary body.
 *
 * No spark-avro connector exists in this environment (only core
 * avro-1.12.1.jar), so the row<->bytes bridge is a per-partition
 * mapPartitions over a direct binary codec (writeDatum/readDatum below,
 * with the library reader as the cross-version resolution path) —
 * serialization is inherently per-record work, and the surrounding plan
 * stays columnar/codegen'd.
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
    // temporal/decimal ride as Avro LOGICAL types (the standard registry
    // shapes a Connect Avro converter emits for Timestamp/Date/Decimal
    // schemas — reference ConvertingEngineBuilder.java:198-234 delegates to
    // exactly those converters; perf schema carries timestamptz,
    // /root/reference/perf/workloads/iot/schema.sql:4-17)
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(fieldSchema(vt, valueContainsNull, s"${path}_value"))
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

  /**
   * Direct Avro-binary writer (the public spec: zigzag-varint longs/ints/
   * lengths/union-indexes/array-block-counts, little-endian float/double,
   * length-prefixed utf8/bytes, record = fields in order, nullable =
   * union(null, T) index prefix, array = counted blocks + 0 terminator).
   * Hand-rolled because GenericDatumWriter's per-field resolveUnion
   * reflection dominated the nested-envelope encode (measured ~5x the cost
   * of the structurally identical proto writer); the library's
   * GenericDatumReader still decodes the output — every round-trip test
   * cross-checks this writer against the reference implementation.
   */
  private def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zigzag
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeDatum(out: ByteArrayOutputStream, v: Any, dt: DataType,
                         nullable: Boolean): Unit = {
    if (nullable) {
      if (v == null) { out.write(0); return } // union index 0 = null
      out.write(2) // union index 1, zigzag-varint encoded
    } else require(v != null, s"null value for non-nullable avro field of $dt")
    dt match {
      case LongType    => writeVarLong(out, v.asInstanceOf[Long])
      case IntegerType => writeVarLong(out, v.asInstanceOf[Int].toLong)
      case ShortType   => writeVarLong(out, v.asInstanceOf[Short].toLong)
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case DoubleType =>
        var bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        var i = 0; while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      case FloatType =>
        var bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
        var i = 0; while (i < 4) { out.write(bits & 0xff); bits >>>= 8; i += 1 }
      case StringType =>
        val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
      case TimestampType =>
        writeVarLong(out, v match {
          case t: java.sql.Timestamp =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
          case i: java.time.Instant =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
        })
      case TimestampNTZType =>
        writeVarLong(out, org.apache.spark.sql.catalyst.util.DateTimeUtils
          .localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime]))
      case DateType =>
        writeVarLong(out, (v match {
          case d: java.sql.Date =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
          case d: java.time.LocalDate => d.toEpochDay.toInt
        }).toLong)
      case d: DecimalType =>
        // Avro decimal logical type: unscaled two's-complement big-endian
        // bytes at the SCHEMA's scale
        val b = v.asInstanceOf[java.math.BigDecimal]
          .setScale(d.scale).unscaledValue().toByteArray
        writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
      case MapType(StringType, vt, valueContainsNull) =>
        val m = v.asInstanceOf[scala.collection.Map[String, Any]]
        if (m.nonEmpty) {
          writeVarLong(out, m.size.toLong)
          m.foreach { case (k, mv) =>
            val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            writeVarLong(out, kb.length.toLong); out.write(kb, 0, kb.length)
            writeDatum(out, mv, vt, valueContainsNull)
          }
        }
        out.write(0) // map block terminator
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          writeDatum(out, if (row.isNullAt(i)) null else row.get(i), f.dataType, f.nullable)
          i += 1
        }
      case ArrayType(et, containsNull) =>
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        if (seq.nonEmpty) {
          writeVarLong(out, seq.length.toLong)
          seq.foreach(e => writeDatum(out, e, et, containsNull))
        }
        out.write(0) // array block terminator
      case other => throw new IllegalArgumentException(s"unsupported avro field type $other")
    }
  }

  /**
   * Direct Avro-binary reader for the NO-RESOLUTION case (writer schema id
   * == reader schema id — the overwhelmingly common path): the library's
   * GenericDatumReader pays ResolvingDecoder machinery per record even when
   * nothing needs resolving, which dominated the nested-envelope decode.
   * Records written at a DIFFERENT schema version still go through the
   * library reader (Avro schema resolution fills/reorders fields).
   */
  private final class Cursor(var pos: Int)

  private def readVarLong(wire: Array[Byte], c: Cursor): Long = {
    var shift = 0; var acc = 0L; var b = 0
    do {
      b = wire(c.pos) & 0xff; c.pos += 1
      acc |= (b & 0x7fL) << shift; shift += 7
    } while ((b & 0x80) != 0)
    (acc >>> 1) ^ -(acc & 1) // unzigzag
  }

  private def readDatum(wire: Array[Byte], c: Cursor, dt: DataType,
                        nullable: Boolean): Any = {
    if (nullable && readVarLong(wire, c) == 0L) return null
    dt match {
      case LongType    => readVarLong(wire, c)
      case IntegerType => readVarLong(wire, c).toInt
      case ShortType   => readVarLong(wire, c).toShort
      case BooleanType => val b = wire(c.pos); c.pos += 1; b != 0
      case DoubleType =>
        var bits = 0L
        var i = 0; while (i < 8) { bits |= (wire(c.pos + i) & 0xffL) << (8 * i); i += 1 }
        c.pos += 8
        java.lang.Double.longBitsToDouble(bits)
      case FloatType =>
        var bits = 0
        var i = 0; while (i < 4) { bits |= (wire(c.pos + i) & 0xff) << (8 * i); i += 1 }
        c.pos += 4
        java.lang.Float.intBitsToFloat(bits)
      case StringType =>
        val len = readVarLong(wire, c).toInt
        val s = new String(wire, c.pos, len, java.nio.charset.StandardCharsets.UTF_8)
        c.pos += len; s
      case BinaryType =>
        val len = readVarLong(wire, c).toInt
        val b = java.util.Arrays.copyOfRange(wire, c.pos, c.pos + len)
        c.pos += len; b
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaTimestamp(readVarLong(wire, c))
      case TimestampNTZType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .microsToLocalDateTime(readVarLong(wire, c))
      case DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaDate(readVarLong(wire, c).toInt)
      case d: DecimalType =>
        val len = readVarLong(wire, c).toInt
        val unscaled = new java.math.BigInteger(
          java.util.Arrays.copyOfRange(wire, c.pos, c.pos + len))
        c.pos += len
        new java.math.BigDecimal(unscaled, d.scale)
      case MapType(StringType, vt, valueContainsNull) =>
        val buf = Map.newBuilder[String, Any]
        var count = readVarLong(wire, c)
        while (count != 0L) {
          if (count < 0L) { readVarLong(wire, c); count = -count } // block byte-size
          var i = 0L
          while (i < count) {
            val klen = readVarLong(wire, c).toInt
            val k = new String(wire, c.pos, klen, java.nio.charset.StandardCharsets.UTF_8)
            c.pos += klen
            buf += k -> readDatum(wire, c, vt, valueContainsNull)
            i += 1
          }
          count = readVarLong(wire, c)
        }
        buf.result()
      case st: StructType =>
        val vals = new Array[Any](st.fields.length)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          vals(i) = readDatum(wire, c, f.dataType, f.nullable); i += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      case ArrayType(et, containsNull) =>
        val buf = Seq.newBuilder[Any]
        var count = readVarLong(wire, c)
        while (count != 0L) {
          if (count < 0L) { readVarLong(wire, c); count = -count } // block byte-size
          var i = 0L
          while (i < count) { buf += readDatum(wire, c, et, containsNull); i += 1 }
          count = readVarLong(wire, c)
        }
        buf.result()
      case other => throw new IllegalArgumentException(s"unsupported avro field type $other")
    }
  }

  /** avro datum -> Spark value, recursively (Utf8 -> String, ByteBuffer ->
    * Array[Byte], GenericRecord -> Row, avro array -> Seq). */
  private def fromDatum(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    // logical types arrive from GenericDatumReader as their BASE types (no
    // conversions are registered) — map them onto the Spark type
    case l: java.lang.Long if dt == TimestampType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(l)
    case l: java.lang.Long if dt == TimestampNTZType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(l)
    case i: Integer if dt == DateType =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(i)
    case bb: java.nio.ByteBuffer if dt.isInstanceOf[DecimalType] =>
      val a = new Array[Byte](bb.remaining()); bb.get(a)
      new java.math.BigDecimal(new java.math.BigInteger(a),
        dt.asInstanceOf[DecimalType].scale)
    case m: java.util.Map[_, _] =>
      val vt = dt.asInstanceOf[MapType].valueType
      val b = Map.newBuilder[String, Any]
      m.forEach((k, mv) => b += k.toString -> fromDatum(mv, vt))
      b.result()
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case rec: GenericRecord =>
      // positional: decoded records follow the READER schema, which is built
      // from this same StructType (schema resolution re-orders/fills fields
      // into reader shape), so field i lines up
      val st = dt.asInstanceOf[StructType]
      val vals = new Array[Any](st.fields.length)
      var i = 0
      while (i < st.fields.length) {
        vals(i) = fromDatum(rec.get(i), st.fields(i).dataType); i += 1
      }
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
    case l: java.util.List[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val b = Seq.newBuilder[Any]
      l.forEach(e => b += fromDatum(e, et))
      b.result()
    case i: Integer if dt == ShortType => Short.box(i.shortValue())
    case _ => v
  }

  def headerSchemaId(wire: Array[Byte],
                     framing: String = RegistryFraming.Confluent): Int =
    RegistryFraming.schemaId(framing, MAGIC, wire)

  /**
   * Serialize `payloadCols` of each row into an Avro `wire` binary column
   * (header + body); `keep` columns pass through. The Avro Schema is built
   * once per task from the (serializable) StructType — avro Schemas
   * themselves don't cross the driver/executor boundary.
   */
  def encode(df: DataFrame, payloadCols: Seq[String], schemaId: Int,
             keep: Seq[String] = Seq.empty,
             framing: String = RegistryFraming.Confluent): DataFrame = {
    val payloadType = StructType(payloadCols.map(c => df.schema(c)).toArray)
    val outSchema = StructType(keep.map(c => df.schema(c)) :+
      StructField("wire", BinaryType, nullable = false))
    val hdr = RegistryFraming.header(framing, MAGIC, schemaId)
    df.select(keep.map(col) :+ struct(payloadCols.map(col): _*).as("_payload"): _*)
      .mapPartitions { rows =>
        val bos = new ByteArrayOutputStream(256)
        rows.map { row =>
          val p = row.getStruct(row.length - 1)
          bos.reset()
          bos.write(hdr, 0, hdr.length)
          writeDatum(bos, p, payloadType, nullable = false)
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
             keep: Seq[String] = Seq.empty,
             framing: String = RegistryFraming.Confluent): DataFrame = {
    val hlen = RegistryFraming.headerLen(framing)
    val target = registry(targetSchemaId)
    val outSchema = StructType(keep.map(c => df.schema(c)).toArray ++ target.fields)
    df.select((keep.map(col) :+ col("wire")): _*)
      .mapPartitions { rows =>
        val schemas = scala.collection.mutable.Map.empty[Int, Schema]
        def schemaFor(id: Int): Schema =
          schemas.getOrElseUpdate(id, avroSchema(registry(id), s"payload_v$id"))
        val targetAvro = schemaFor(targetSchemaId)
        // one reader per WRITER schema version per task, not per row — the
        // reader embeds the (expensive) writer->reader resolution
        val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
        def readerFor(id: Int): GenericDatumReader[GenericRecord] =
          readers.getOrElseUpdate(id,
            new GenericDatumReader[GenericRecord](schemaFor(id), targetAvro))
        var decoder: org.apache.avro.io.BinaryDecoder = null
        rows.map { row =>
          val wire = row.getAs[Array[Byte]](row.length - 1)
          val id = headerSchemaId(wire, framing)
          val n = target.fields.length
          val vals = new Array[Any](n)
          if (id == targetSchemaId) {
            // fast path: exact schema match, direct binary read
            val c = new Cursor(hlen)
            var i = 0
            while (i < n) {
              val f = target.fields(i)
              vals(i) = readDatum(wire, c, f.dataType, f.nullable); i += 1
            }
          } else {
            // writer schema from the header, reader schema = target version
            // (Avro schema resolution fills added fields with defaults)
            decoder = DecoderFactory.get().binaryDecoder(wire, hlen, wire.length - hlen, decoder)
            val rec = readerFor(id).read(null, decoder)
            var i = 0
            while (i < n) { vals(i) = fromDatum(rec.get(i), target.fields(i).dataType); i += 1 }
          }
          new GenericRowWithSchema(
            (row.toSeq.dropRight(1) ++ vals).toArray, outSchema): Row
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      .asInstanceOf[DataFrame]
  }
}
