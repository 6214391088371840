package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import graft.cdc.{Envelope, ServerConfig}

/**
 * The reference's dataflow operators (SURVEY.md §2), each exposed as a named
 * DataFrame query over the driver's `events` table with a DuckDB-equivalent
 * oracle. The events table stands in for the change stream: `event_id` is
 * the LSN, `user_id` the key, `event_type` the op/route, `props` the payload.
 *
 * Every query ends in a total ORDER BY so the Spark parquet dump and the
 * DuckDB result are row-identical, and float arithmetic is avoided or made
 * exact (integer sums / single divisions of exact operands) so value hashes
 * match bit-for-bit.
 */
object CdcQueries {
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // N1 max-LSN dedup, window formulation (Window.partitionBy.orderBy + row_number)
    "cdc_dedup_last_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_lsn"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy("user_id")
    }),

    // N1 max-LSN dedup, aggregation formulation (partial-agg friendly: the
    // engine's hot path — map-side combine collapses hot keys pre-shuffle)
    "cdc_dedup_last_maxby" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"))
        .agg(
          max(col("event_id")).as("last_lsn"),
          max_by(col("event_type"), col("event_id")).as("last_type"),
          max_by(col("value"), col("event_id")).as("last_value"))
        .orderBy("user_id")),

    // A3 offset max-tracking: last offset per source-partition wins
    "cdc_offset_max" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(max(col("event_id")).as("last_offset"), count(lit(1)).as("n_records"))
        .orderBy("event_type")),

    // A2/N-lineage: per-partition (partition, firstLSN, lastLSN, rowCount, bytes)
    "cdc_lineage_agg" -> ((s, d) =>
      ev(s, d).withColumn("partition", pmod(col("event_id"), lit(16)))
        .groupBy(col("partition"))
        .agg(
          min(col("event_id")).as("firstLSN"),
          max(col("event_id")).as("lastLSN"),
          count(lit(1)).as("rowCount"),
          sum(length(coalesce(col("props"), lit("")))).as("bytes"))
        .orderBy("partition")),

    // T3 filter + T4 RegexRouter: drop-by-predicate then regex-rewrite the destination
    "cdc_route_filter" -> ((s, d) =>
      ev(s, d).filter(col("event_type") =!= "error")
        .select(col("event_id"),
          concat(lit("stream."), regexp_replace(col("event_type"), "(e|i)", "X"))
            .as("destination"))
        .orderBy("event_id")),

    // MaskField + column.truncate SMTs (reference Transformations.java
    // instantiates any stock Connect Transformation from config; Debezium's
    // column.mask.with / column.truncate.to are the connector-level twins).
    // Built through the DECLARATIVE config chain so the oracle gates the
    // config path, not a code-wired equivalent.
    "cdc_mask_truncate" -> ((s, d) =>
      ServerConfig.transformChain(Map(
        "graft.transforms" -> "mask,pii,trunc",
        "graft.transforms.mask.type" -> "maskfield",
        "graft.transforms.mask.fields" -> "props",
        "graft.transforms.mask.mask.length" -> "8",
        "graft.transforms.pii.type" -> "maskfield",
        "graft.transforms.pii.fields" -> "value",
        "graft.transforms.trunc.type" -> "truncatefield",
        "graft.transforms.trunc.fields" -> "event_type",
        "graft.transforms.trunc.length" -> "3"))(ev(s, d))
        .select("event_id", "event_type", "value", "props")
        .orderBy("event_id")),

    // T7 tombstone suppression + T8 null-key surrogate
    "cdc_tombstone_nullkey" -> ((s, d) =>
      ev(s, d).filter(col("value").isNotNull)
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("click")), lit("default")).as("part_key"))
        .orderBy("event_id")),

    // T2 FLATTEN / ExtractNewRecordState: project the payload out of the envelope
    "cdc_flatten_payload" -> ((s, d) =>
      ev(s, d).select(col("event_id"), col("props"), col("event_type"))
        .orderBy("event_id") // before the json extraction — see cdc_roundtrip_avro
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("event_type").as("op_hint"))),

    // N2 keyed MERGE upsert/delete: delta (odd LSNs) applied over snapshot
    // (even LSNs); event_type='error' in the delta acts as the delete op
    "cdc_merge_upsert" -> ((s, d) => {
      val e = ev(s, d)
      val snap = e.filter(pmod(col("event_id"), lit(2)) === 0)
        .groupBy(col("user_id")).agg(
          max(col("event_id")).as("s_lsn"),
          max_by(col("value"), col("event_id")).as("s_value"))
      val delta = e.filter(pmod(col("event_id"), lit(2)) === 1)
        .groupBy(col("user_id")).agg(
          max(col("event_id")).as("d_lsn"),
          max_by(col("value"), col("event_id")).as("d_value"),
          max_by(col("event_type"), col("event_id")).as("d_op"))
      snap.join(delta, Seq("user_id"), "full_outer")
        .filter(col("d_op").isNull || col("d_op") =!= "error") // delete fence
        .select(col("user_id"),
          coalesce(col("d_lsn"), col("s_lsn")).as("lsn"),
          coalesce(col("d_value"), col("s_value")).as("value"))
        .orderBy("user_id")
    }),

    // S7 snapshot ∪ stream union with LSN watermark separating the phases
    "cdc_snapshot_union" -> ((s, d) => {
      val e = ev(s, d)
      val snapshot = e.filter(col("event_id") < 100)
        .select(col("user_id"), col("event_id"), lit("r").as("op"), col("value"))
      val stream = e.filter(col("event_id") >= 100)
        .select(col("user_id"), col("event_id"), lit("u").as("op"), col("value"))
      val all = snapshot.unionByName(stream)
      all.groupBy(col("user_id"))
        .agg(max(col("event_id")).as("last_lsn"),
          max_by(col("op"), col("event_id")).as("last_op"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    // F1 key/value converter: serialize the flattened payload to JSON wire
    // format (the reference's default format, ServerApp.java:97-99)
    "cdc_serialize_json" -> ((s, d) =>
      ev(s, d).select(col("event_id"), col("event_type"), col("props"))
        .orderBy("event_id") // before the to_json — see cdc_roundtrip_avro
        .select(col("event_id"),
          to_json(struct(
            col("event_id").as("lsn"),
            col("event_type").as("op"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))).as("wire"))),

    // streaming-style tumbling window aggregation (1h) per event type
    "cdc_window_hourly" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_lsn"))
        .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("max_lsn"))
        .orderBy("hour_start", "event_type")),

    // gap-based sessionization (30 min) — the batch formulation of
    // flatMapGroupsWithState session state
    "cdc_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts").cast("timestamp").cast("double")
              - col("prev_ts").cast("timestamp").cast("double")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_no", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_lsn"), max(col("event_id")).as("last_lsn"))
        .orderBy("user_id", "session_no")
    }),

    // F1 Avro wire format round trip: registry-framed binary encode (magic +
    // schema id + avro body) then decode — values must survive bit-exactly.
    // The total order is established BEFORE the codec (r6, here and in the
    // other wire queries): a trailing orderBy's range partitioner samples
    // its child, executing the per-row encode+decode twice; sorting the slim
    // payload first runs the codec exactly once (projections preserve the
    // sorted order, and event_id is the unique sort key either way).
    "cdc_roundtrip_avro" -> ((s, d) => {
      val payload = ev(s, d).select(col("event_id"), col("event_type").as("op"),
          get_json_object(col("props"), "$.k").cast("int").as("k"), col("value").as("v"))
        .orderBy("event_id")
      val pt = StructType(Seq("op", "k", "v").map(payload.schema(_)))
      val wire = graft.formats.AvroWire.encode(payload, Seq("op", "k", "v"), 0,
        keep = Seq("event_id"))
      graft.formats.AvroWire.decode(wire, Map(0 -> pt), 0, keep = Seq("event_id"))
    }),

    // F1 protobuf wire format round trip (proto3 wire encoding: zigzag
    // varints, fixed64 doubles, length-delimited strings; absent = NULL)
    "cdc_roundtrip_proto" -> ((s, d) => {
      val payload = ev(s, d).select(col("event_id"), col("event_type").as("op"),
          get_json_object(col("props"), "$.k").cast("int").as("k"), col("value").as("v"))
        .orderBy("event_id") // before the codec — see cdc_roundtrip_avro
      val pt = StructType(Seq("op", "k", "v").map(payload.schema(_)))
      val wire = graft.formats.ProtoWire.encode(payload, Seq("op", "k", "v"), 0,
        keep = Seq("event_id"))
      graft.formats.ProtoWire.decode(wire, Map(0 -> pt), 0, keep = Seq("event_id"))
    }),

    // F1 CloudEvents 1.0 JSON envelope (the fourth converter family)
    "cdc_cloudevents" -> ((s, d) =>
      ev(s, d).select(col("event_id"), col("event_type"), col("props"))
        .orderBy("event_id") // before the to_json — see cdc_roundtrip_avro
        .select(col("event_id"),
          graft.formats.WireFormat.cloudEvents(
            struct(col("event_id").as("lsn"), col("event_type").as("op"),
              coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(-1)).as("k")),
            col("event_id"), "graft.cdc.change").as("wire"))),

    // T2/F1 the REAL Debezium envelope: build the nested
    // {before, after, source{...}, op, ts_ms} JSON with YB {value,set} cells
    // (reference S3ConsumerIT.java:117-144 + YBExtractNewRecordState,
    // ServerApp.java:167-178), then decode it back via from_json + cell
    // normalization + flatten — the ingestion path a user pointing this
    // engine at actual Debezium output exercises first
    "cdc_envelope_decode" -> ((s, d) => {
      val payload = StructType(Seq(
        StructField("user_id", LongType), StructField("k", IntegerType)))
      val imgType = Envelope.imageSchema(payload, ybCells = true)
      val op = when(col("event_type") === "error", "d")
        .when(col("event_type") === "click", "u").otherwise(lit("c"))
      val after = struct(
        struct(col("user_id").as("value"), lit(true).as("set")).as("user_id"),
        struct(get_json_object(col("props"), "$.k").cast("int").as("value"),
          lit(true).as("set")).as("k"))
      val wire = ev(s, d)
        .select(col("event_id"), col("event_type"), col("user_id"), col("props"), col("ts"))
        .orderBy("event_id") // before encode+decode — see cdc_roundtrip_avro
        .select(col("event_id"),
        to_json(struct(
          lit(null).cast(imgType).as("before"),
          when(op === "d", lit(null).cast(imgType)).otherwise(after).as("after"),
          struct(lit("1.9.5.y.220").as("version"), lit("yugabytedb").as("connector"),
            lit("graft").as("name"), unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
            lit("yugabyte").as("db"), lit("public").as("schema"), lit("events").as("table"),
            (col("event_id") / 16).cast("long").as("txId"),
            col("event_id").as("lsn")).as("source"),
          op.as("op"), unix_millis(col("ts").cast("timestamp")).as("ts_ms"))).as("value"))
      // parse once (multi-referenced intermediate), then project — see
      // Envelope.decodeJson for why
      val j = col("_j")
      wire.withColumn("_j",
          from_json(col("value"), Envelope.envelopeSchema(payload, ybCells = true)))
        .select(col("event_id"),
          j("op").as("op"),
          j("source")("lsn").as("lsn"),
          j("source")("txId").as("txid"),
          when(j("after")("user_id")("set") === true, j("after")("user_id")("value")).as("user_id"),
          when(j("after")("k")("set") === true, j("after")("k")("value")).as("k"),
          j("ts_ms").as("ts_ms"))
    }),

    // F2 INDEPENDENT key/value converters (reference
    // cdcsdk.server.format.{key,value}, ServerApp.java:152-153): Avro key +
    // JSON value — the registry-backed-Kafka deployment shape — encoded and
    // decoded through different converter families on the same records,
    // value-level identity as the gate
    "cdc_wire_keyvalue" -> ((s, d) => {
      val payload = ev(s, d).select(col("event_id").as("lsn"), col("user_id"),
          col("event_type").as("op"),
          get_json_object(col("props"), "$.k").cast("int").as("k"), col("value").as("v"))
        .orderBy("lsn") // before the converter chain — see cdc_roundtrip_avro
      val keyT = StructType(Seq(payload.schema("user_id")))
      val valT = StructType(Seq("op", "k", "v").map(payload.schema(_)))
      val withValue = graft.formats.WireFormat.encode(payload,
          graft.formats.WireFormat.Json, Seq("op", "k", "v"), 0,
          keep = Seq("lsn", "user_id"))
        .withColumnRenamed("wire", "value")
      val kv = graft.formats.AvroWire.encode(withValue, Seq("user_id"), 0,
          keep = Seq("lsn", "value"))
        .withColumnRenamed("wire", "key")
      val keyFlat = graft.formats.AvroWire.decode(
        kv.withColumnRenamed("key", "wire"), Map(0 -> keyT), 0, keep = Seq("lsn", "value"))
      graft.formats.WireFormat.decode(keyFlat.withColumnRenamed("value", "wire"),
          graft.formats.WireFormat.Json, Map(0 -> valT), 0, keep = Seq("lsn", "user_id"))
    }),

    // F1/F2 schemas.enable (reference ServerApp.java:177-183): JSON wire
    // with the Connect schema block embedded per record — encode+decode
    // round trip through the schema-embedded path must be the identity
    // (the block's CONTENT is asserted in WireFormatSpec; this gates the
    // wire path end to end in the driver's oracle)
    "cdc_schema_embed" -> ((s, d) => {
      val payload = ev(s, d).select(col("event_id").as("lsn"),
          col("event_type").as("op"),
          get_json_object(col("props"), "$.k").cast("int").as("k"), col("value").as("v"))
        .orderBy("lsn") // before the codec — see cdc_roundtrip_avro
        // (a repartitionByRange+sortWithinPartitions spelling that would keep
        // the schema-collect pass's exchange was tried and measured SLOWER —
        // the extra shuffle costs more than the collect pass's single-task
        // encode saves at this scale)
      val pt = StructType(Seq("op", "k", "v").map(payload.schema(_)))
      val wire = graft.formats.WireFormat.encode(payload,
        graft.formats.WireFormat.Json, Seq("op", "k", "v"), 0,
        keep = Seq("lsn"), schemasEnable = true)
      graft.formats.WireFormat.decode(wire, graft.formats.WireFormat.Json,
          Map(0 -> pt), 0, keep = Seq("lsn"), schemasEnable = true)
    }),

    // before-image support (REPLICA IDENTITY FULL — reference envelope
    // carries `before`, S3ConsumerIT.java:117-144): updates/deletes wrap the
    // old row image (here the previous event's value per key, via lag),
    // creates don't; decode exposes before_* columns. Value-level identity
    // through the REAL Envelope.wrapJson/decodeJson operator surface.
    "cdc_envelope_before" -> ((s, d) => {
      val byKey = Window.partitionBy(col("user_id")).orderBy(col("lsn"))
      val op = when(col("event_type") === "error", "d")
        .when(col("event_type") === "click", "u").otherwise(lit("c"))
      val base = ev(s, d).select(
          col("event_id").as("lsn"), op.as("op"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
        .withColumn("before_user_id", lag(col("user_id"), 1).over(byKey))
        .withColumn("before_k", lag(col("k"), 1).over(byKey))
        .orderBy("lsn") // before wrap+decode — see cdc_roundtrip_avro
      val wire = Envelope.wrapJson(base, keyCols = Seq("user_id"),
        payloadCols = Seq("k"), ybCells = true, table = "events",
        replicaIdentityFull = true)
      Envelope.decodeJson(wire,
          StructType(Seq(StructField("user_id", LongType))),
          StructType(Seq(StructField("k", IntegerType))),
          ybCells = true, withBefore = true)
        .select(col("lsn"), col("op"), col("user_id"), col("k"), col("before_k"))
    }),

    // F1 the FULL nested envelope through the Avro converter (reference
    // ConvertingEngineBuilder.java:198-234 serializes ANY Connect schema —
    // the registry-Kafka default runs Avro WITHOUT the FLATTEN transform, so
    // the {before, after{cells}, source{...}, op, ts_ms} nesting itself goes
    // on the wire): struct-envelope -> registry-framed Avro binary ->
    // decode -> cell-normalized flatten, value-identity as the gate
    "cdc_envelope_avro" -> ((s, d) => {
      val byKey = Window.partitionBy(col("user_id")).orderBy(col("lsn"))
      val op = when(col("event_type") === "error", "d")
        .when(col("event_type") === "click", "u").otherwise(lit("c"))
      val base = ev(s, d).select(
          col("event_id").as("lsn"), op.as("op"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
        .withColumn("before_user_id", lag(col("user_id"), 1).over(byKey))
        .withColumn("before_k", lag(col("k"), 1).over(byKey))
        .orderBy("lsn") // before the codec — see cdc_roundtrip_avro
      val withEnv = base.select(col("lsn").as("event_lsn"),
        Envelope.envelopeStruct(base, keyCols = Seq("user_id"),
          payloadCols = Seq("k"), ybCells = true, table = "events",
          replicaIdentityFull = true).as("env"))
      // registry entry = the runtime schema (writer and reader must agree
      // bit-exactly — binary Avro has no self-describing fallback)
      val envT = StructType(Seq(withEnv.schema("env")))
      val wire = graft.formats.AvroWire.encode(withEnv, Seq("env"), 7,
        keep = Seq("event_lsn"))
      val e = col("env")
      def cell(img: org.apache.spark.sql.Column, f: String) =
        when(img(f)("set") === true, img(f)("value"))
      graft.formats.AvroWire.decode(wire, Map(7 -> envT), 7, keep = Seq("event_lsn"))
        .select(
          col("event_lsn").as("lsn"),
          e("op").as("op"),
          cell(e("after"), "user_id").as("user_id"),
          cell(e("after"), "k").as("k"),
          cell(e("before"), "user_id").as("before_user_id"),
          cell(e("before"), "k").as("before_k"))
    }),

    // F1 the same nested envelope through the PROTO converter (embedded
    // messages, proto3 presence semantics — the reference's third converter
    // family serializes the unflattened envelope identically,
    // ConvertingEngineBuilder.java:198-234)
    "cdc_envelope_proto" -> ((s, d) => {
      val byKey = Window.partitionBy(col("user_id")).orderBy(col("lsn"))
      val op = when(col("event_type") === "error", "d")
        .when(col("event_type") === "click", "u").otherwise(lit("c"))
      val base = ev(s, d).select(
          col("event_id").as("lsn"), op.as("op"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
        .withColumn("before_user_id", lag(col("user_id"), 1).over(byKey))
        .withColumn("before_k", lag(col("k"), 1).over(byKey))
        .orderBy("lsn") // before the codec — see cdc_roundtrip_avro
      val withEnv = base.select(col("lsn").as("event_lsn"),
        Envelope.envelopeStruct(base, keyCols = Seq("user_id"),
          payloadCols = Seq("k"), ybCells = true, table = "events",
          replicaIdentityFull = true).as("env"))
      val envT = StructType(Seq(withEnv.schema("env")))
      val wire = graft.formats.ProtoWire.encode(withEnv, Seq("env"), 8,
        keep = Seq("event_lsn"))
      val e = col("env")
      def cell(img: org.apache.spark.sql.Column, f: String) =
        when(img(f)("set") === true, img(f)("value"))
      graft.formats.ProtoWire.decode(wire, Map(8 -> envT), 8, keep = Seq("event_lsn"))
        .select(
          col("event_lsn").as("lsn"),
          e("op").as("op"),
          cell(e("after"), "user_id").as("user_id"),
          cell(e("after"), "k").as("k"),
          cell(e("before"), "user_id").as("before_user_id"),
          cell(e("before"), "k").as("before_k"))
    }),

    // F1 temporal/decimal/map columns through the Avro converter as LOGICAL
    // types (reference perf schema ships timestamptz + jsonb —
    // perf/workloads/iot/schema.sql:4-17 — and the Connect converters carry
    // them as Timestamp/Date/Decimal logical schemas,
    // ConvertingEngineBuilder.java:198-234): typed encode -> registry-framed
    // wire -> typed decode, identity gated at full value fidelity (micros,
    // decimal scale, map lookups)
    "cdc_wire_temporal" -> ((s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      val base = ev(s, d).select(
          col("event_id").as("lsn"),
          col("ts").cast("timestamp").as("ts_tz"),
          col("ts").as("ts_ntz"), // events.ts is TIMESTAMP_NTZ in the parquet
          to_date(col("ts")).as("day"),
          // string-built decimal: exact in both engines (no float rounding)
          concat(k.cast("string"), lit("."),
            lpad(pmod(col("event_id"), lit(10000)).cast("string"), 4, "0"))
            .cast("decimal(12,4)").as("amount"),
          map(lit("type"), col("event_type"), lit("k"), k.cast("string")).as("attrs"))
        .orderBy("lsn") // before the codec — see cdc_roundtrip_avro
      val cols = Seq("ts_tz", "ts_ntz", "day", "amount", "attrs")
      val pt = StructType(cols.map(base.schema(_)))
      val wire = graft.formats.AvroWire.encode(base, cols, 11, keep = Seq("lsn"))
      graft.formats.AvroWire.decode(wire, Map(11 -> pt), 11, keep = Seq("lsn"))
        .select(col("lsn"),
          unix_micros(col("ts_tz")).as("ts_us"),
          unix_micros(col("ts_ntz").cast("timestamp")).as("ntz_us"),
          col("day").cast("string").as("day_s"),
          col("amount").cast("string").as("amount_s"),
          col("attrs")("type").as("attr_type"),
          col("attrs")("k").as("attr_k"))
    }),

    // F5 time-pattern path rendering ({YEAR}/{MONTH}/... object naming,
    // deterministic — no UUID, see SURVEY §7.3)
    "cdc_time_path" -> ((s, d) =>
      ev(s, d).select(col("event_id"), col("ts"), col("event_type"))
        .orderBy("event_id") // before the path rendering — see cdc_roundtrip_avro
        .select(col("event_id"),
          concat(
            year(col("ts")).cast("string"), lit("/"),
            lpad(month(col("ts")).cast("string"), 2, "0"), lit("/"),
            lpad(dayofmonth(col("ts")).cast("string"), 2, "0"), lit("/"),
            lpad(hour(col("ts")).cast("string"), 2, "0"), lit("/"),
            col("event_type")).as("path"))),

    // T outbox event router (Debezium EventRouter semantics, the SMT family
    // the reference's transform chain hosts): the events table as an outbox
    // table — aggregate type routes the destination, aggregate id becomes
    // the key, the payload rides as-is plus one expanded field; rows with a
    // null payload are tombstones and are dropped (route.tombstone=drop)
    "cdc_outbox_route" -> ((s, d) =>
      ev(s, d).filter(col("props").isNotNull) // tombstone drop BEFORE the sort
        .select(col("event_id"), col("event_type"), col("user_id"), col("props"))
        .orderBy("event_id") // before the json extraction — see cdc_roundtrip_avro
        .select(
          col("event_id").as("outbox_id"),
          concat(lit("outbox.event."), col("event_type")).as("destination"),
          col("user_id").as("aggregate_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("props").as("payload"))),

    // transaction-boundary metadata (Debezium transaction topic: BEGIN/END
    // markers with per-tx event counts; the envelope's source.txId is the
    // same lsn/16 grouping used by cdc_envelope_decode): one END row per tx
    // with its event count, LSN bounds and distinct collections touched
    "cdc_tx_boundaries" -> ((s, d) =>
      ev(s, d).withColumn("txId", (col("event_id") / 16).cast("long"))
        .groupBy(col("txId"))
        .agg(
          count(lit(1)).as("event_count"),
          min(col("event_id")).as("first_lsn"),
          max(col("event_id")).as("last_lsn"),
          countDistinct(col("event_type")).as("n_collections"))
        .withColumn("status", lit("END"))
        .orderBy("txId"))
  )

  val oracles: Map[String, String] = Map(
    "cdc_dedup_last_window" ->
      """SELECT user_id, event_id AS last_lsn, event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc_dedup_last_maxby" ->
      """SELECT user_id, max(event_id) AS last_lsn,
        |       arg_max(event_type, event_id) AS last_type,
        |       arg_max(value, event_id) AS last_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "cdc_offset_max" ->
      """SELECT event_type, max(event_id) AS last_offset, count(*) AS n_records
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc_lineage_agg" ->
      """SELECT event_id % 16 AS partition, min(event_id) AS firstLSN, max(event_id) AS lastLSN,
        |       count(*) AS rowCount, CAST(sum(length(coalesce(props, ''))) AS BIGINT) AS bytes
        |FROM events GROUP BY 1 ORDER BY partition""".stripMargin,
    "cdc_route_filter" ->
      """SELECT event_id, 'stream.' || regexp_replace(event_type, '(e|i)', 'X', 'g') AS destination
        |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin,
    "cdc_tombstone_nullkey" ->
      """SELECT event_id, coalesce(nullif(event_type, 'click'), 'default') AS part_key
        |FROM events WHERE value IS NOT NULL ORDER BY event_id""".stripMargin,
    "cdc_mask_truncate" ->
      """SELECT event_id, substring(event_type, 1, 3) AS event_type,
        |       CAST(NULL AS DOUBLE) AS value, repeat('*', 8) AS props
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_flatten_payload" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |       event_type AS op_hint
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_merge_upsert" ->
      """WITH snap AS (
        |  SELECT user_id, max(event_id) AS s_lsn, arg_max(value, event_id) AS s_value
        |  FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
        |delta AS (
        |  SELECT user_id, max(event_id) AS d_lsn, arg_max(value, event_id) AS d_value,
        |         arg_max(event_type, event_id) AS d_op
        |  FROM events WHERE event_id % 2 = 1 GROUP BY user_id)
        |SELECT user_id, coalesce(d_lsn, s_lsn) AS lsn, coalesce(d_value, s_value) AS value
        |FROM snap FULL OUTER JOIN delta USING (user_id)
        |WHERE d_op IS NULL OR d_op <> 'error'
        |ORDER BY user_id""".stripMargin,
    "cdc_snapshot_union" ->
      """WITH all_ev AS (
        |  SELECT user_id, event_id, 'r' AS op, value FROM events WHERE event_id < 100
        |  UNION ALL
        |  SELECT user_id, event_id, 'u' AS op, value FROM events WHERE event_id >= 100)
        |SELECT user_id, max(event_id) AS last_lsn, arg_max(op, event_id) AS last_op, count(*) AS n
        |FROM all_ev GROUP BY user_id ORDER BY user_id""".stripMargin,
    "cdc_serialize_json" ->
      """SELECT event_id,
        |       to_json(struct_pack(lsn := event_id, op := event_type,
        |                           k := CAST(json_extract_string(props, '$.k') AS INTEGER)))::VARCHAR AS wire
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_window_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       count(*) AS n, max(event_id) AS max_lsn
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "cdc_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM l),
        |g AS (
        |  SELECT user_id, event_id,
        |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM f)
        |SELECT user_id, session_no, count(*) AS n_events,
        |       min(event_id) AS first_lsn, max(event_id) AS last_lsn
        |FROM g GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin,
    "cdc_roundtrip_avro" ->
      """SELECT event_id, event_type AS op,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value AS v
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_roundtrip_proto" ->
      """SELECT event_id, event_type AS op,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value AS v
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_cloudevents" ->
      """SELECT event_id,
        |       to_json(struct_pack(
        |         "specversion" := '1.0',
        |         "id" := CAST(event_id AS VARCHAR),
        |         "source" := '/graft/cdc',
        |         "type" := 'graft.cdc.change',
        |         "datacontenttype" := 'application/json',
        |         "data" := struct_pack(
        |           "lsn" := event_id, "op" := event_type,
        |           "k" := coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1))
        |       ))::VARCHAR AS wire
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_envelope_decode" ->
      """WITH wire AS (
        |  SELECT event_id,
        |    to_json(struct_pack(
        |      "before" := CAST(NULL AS INTEGER),
        |      "after" := CASE WHEN event_type = 'error' THEN NULL ELSE struct_pack(
        |          "user_id" := struct_pack("value" := user_id, "set" := true),
        |          "k" := struct_pack("value" := CAST(json_extract_string(props, '$.k') AS INTEGER),
        |                             "set" := true)) END,
        |      "source" := struct_pack("version" := '1.9.5.y.220', "connector" := 'yugabytedb',
        |          "name" := 'graft', "ts_ms" := epoch_ms(ts), "db" := 'yugabyte',
        |          "schema" := 'public', "table" := 'events',
        |          "txId" := CAST(floor(event_id / 16) AS BIGINT), "lsn" := event_id),
        |      "op" := CASE WHEN event_type = 'error' THEN 'd'
        |                   WHEN event_type = 'click' THEN 'u' ELSE 'c' END,
        |      "ts_ms" := epoch_ms(ts))) AS value
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(value, '$.op') AS op,
        |  CAST(json_extract(value, '$.source.lsn') AS BIGINT) AS lsn,
        |  CAST(json_extract(value, '$.source.txId') AS BIGINT) AS txid,
        |  CASE WHEN json_extract_string(value, '$.after.user_id.set') = 'true'
        |       THEN CAST(json_extract(value, '$.after.user_id.value') AS BIGINT) END AS user_id,
        |  CASE WHEN json_extract_string(value, '$.after.k.set') = 'true'
        |       THEN CAST(json_extract(value, '$.after.k.value') AS INTEGER) END AS k,
        |  CAST(json_extract(value, '$.ts_ms') AS BIGINT) AS ts_ms
        |FROM wire ORDER BY event_id""".stripMargin,
    "cdc_schema_embed" ->
      """SELECT event_id AS lsn, event_type AS op,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value AS v
        |FROM events ORDER BY lsn""".stripMargin,
    "cdc_wire_keyvalue" ->
      """SELECT event_id AS lsn, user_id, event_type AS op,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value AS v
        |FROM events ORDER BY lsn""".stripMargin,
    "cdc_envelope_before" ->
      """WITH base AS (
        |  SELECT event_id AS lsn,
        |    CASE WHEN event_type = 'error' THEN 'd'
        |         WHEN event_type = 'click' THEN 'u' ELSE 'c' END AS op,
        |    user_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    lag(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS prev_k
        |  FROM events)
        |SELECT lsn, op, user_id,
        |  CASE WHEN op <> 'd' THEN k END AS k,
        |  CASE WHEN op IN ('u', 'd') THEN prev_k END AS before_k
        |FROM base ORDER BY lsn""".stripMargin,
    "cdc_envelope_avro" ->
      """WITH base AS (
        |  SELECT event_id AS lsn,
        |    CASE WHEN event_type = 'error' THEN 'd'
        |         WHEN event_type = 'click' THEN 'u' ELSE 'c' END AS op,
        |    user_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    lag(user_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_user_id,
        |    lag(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS prev_k
        |  FROM events)
        |SELECT lsn, op,
        |  CASE WHEN op <> 'd' THEN user_id END AS user_id,
        |  CASE WHEN op <> 'd' THEN k END AS k,
        |  CASE WHEN op IN ('u', 'd') THEN prev_user_id END AS before_user_id,
        |  CASE WHEN op IN ('u', 'd') THEN prev_k END AS before_k
        |FROM base ORDER BY lsn""".stripMargin,
    "cdc_envelope_proto" ->
      """WITH base AS (
        |  SELECT event_id AS lsn,
        |    CASE WHEN event_type = 'error' THEN 'd'
        |         WHEN event_type = 'click' THEN 'u' ELSE 'c' END AS op,
        |    user_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    lag(user_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_user_id,
        |    lag(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS prev_k
        |  FROM events)
        |SELECT lsn, op,
        |  CASE WHEN op <> 'd' THEN user_id END AS user_id,
        |  CASE WHEN op <> 'd' THEN k END AS k,
        |  CASE WHEN op IN ('u', 'd') THEN prev_user_id END AS before_user_id,
        |  CASE WHEN op IN ('u', 'd') THEN prev_k END AS before_k
        |FROM base ORDER BY lsn""".stripMargin,
    "cdc_wire_temporal" ->
      """SELECT event_id AS lsn,
        |       epoch_us(ts) AS ts_us,
        |       epoch_us(ts) AS ntz_us,
        |       CAST(CAST(ts AS DATE) AS VARCHAR) AS day_s,
        |       CAST(CAST(json_extract_string(props, '$.k') || '.' ||
        |              lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
        |            AS DECIMAL(12,4)) AS VARCHAR) AS amount_s,
        |       event_type AS attr_type,
        |       json_extract_string(props, '$.k') AS attr_k
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_time_path" ->
      """SELECT event_id,
        |       CAST(year(ts) AS VARCHAR) || '/' || lpad(CAST(month(ts) AS VARCHAR), 2, '0')
        |       || '/' || lpad(CAST(day(ts) AS VARCHAR), 2, '0')
        |       || '/' || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || '/' || event_type AS path
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_outbox_route" ->
      """SELECT event_id AS outbox_id,
        |       'outbox.event.' || event_type AS destination,
        |       user_id AS aggregate_id,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |       props AS payload
        |FROM events WHERE props IS NOT NULL ORDER BY outbox_id""".stripMargin,
    "cdc_tx_boundaries" ->
      """SELECT CAST(floor(event_id / 16) AS BIGINT) AS txId,
        |       CAST(count(*) AS BIGINT) AS event_count,
        |       min(event_id) AS first_lsn,
        |       max(event_id) AS last_lsn,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_collections,
        |       'END' AS status
        |FROM events GROUP BY 1 ORDER BY txId""".stripMargin
  )
}
