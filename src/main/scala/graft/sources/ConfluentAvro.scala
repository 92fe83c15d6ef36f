package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Confluent Schema-Registry wire format codec.
  *
  * The reference produces/consumes Confluent-framed Avro: a 1-byte magic
  * 0x00, a 4-byte big-endian schema id, then the raw Avro binary body
  * (reference: services/kstream-agg-rs/src/producer.rs:42-56 encode path,
  * consumer.rs:76-101 decode path, TopicNameStrategy registration at
  * registry_handler.rs:50-58). Spark's distribution here ships no
  * spark-avro / Confluent framing, so this module implements framing +
  * body codec on avro-core directly.
  *
  * Scale notes:
  *  - the codec is a per-row narrow map — no shuffle, no state;
  *  - the Avro `Schema` and datum reader/writer are built once per
  *    executor (transient lazy in the serialized closure), never per row;
  *  - binary en/decoders are reused via DecoderFactory buffer reuse.
  *
  * Coverage: flat record schemas of the primitive types the reference
  * uses — string/long/int/double/float/boolean/bytes plus nullable unions
  * ["null", T] — exactly the shape of `TradesDataAvro` and `EWMA`
  * (models.rs:31-44, indicators.rs:6-11). Nested records are outside the
  * reference's surface and rejected at schema-build time.
  */
object ConfluentAvro {

  val MagicByte: Byte = 0x00

  /** Avro schema JSON for a flat StructType (nullable -> union with null). */
  def avroSchemaJson(st: StructType, name: String, namespace: String = "graft"): String = {
    def prim(dt: DataType): String = dt match {
      case StringType => "\"string\""
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"ConfluentAvro covers flat primitive schemas only, got $other")
    }
    val fields = st.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t${if (f.nullable) ", \"default\": null" else ""}}"""
    }.mkString(",")
    s"""{"type": "record", "name": "$name", "namespace": "$namespace", "fields": [$fields]}"""
  }

  /** Frame a raw Avro body with the Confluent 5-byte header (magic + BE id). */
  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + body.length)
    bb.put(MagicByte).putInt(schemaId).put(body)
    bb.array()
  }

  /** Split a Confluent-framed payload into (schemaId, body). */
  def unframe(payload: Array[Byte]): (Int, Array[Byte]) = {
    require(payload.length >= 5 && payload(0) == MagicByte,
      s"not Confluent-framed: len=${payload.length}")
    val bb = ByteBuffer.wrap(payload, 1, 4)
    (bb.getInt, java.util.Arrays.copyOfRange(payload, 5, payload.length))
  }

  /** Serializable encoder closure: Spark Row -> framed bytes. */
  private final class Encoder(json: String, schemaId: Int)
      extends UDF1[Row, Array[Byte]] with Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(json)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    override def call(row: Row): Array[Byte] = {
      if (row == null) return null
      val rec = new GenericData.Record(schema)
      val it = schema.getFields.iterator()
      while (it.hasNext) {
        val f = it.next()
        val i = row.fieldIndex(f.name)
        val v: AnyRef =
          if (row.isNullAt(i)) null
          else row.get(i) match {
            case s: String => new org.apache.avro.util.Utf8(s)
            case b: Array[Byte] => ByteBuffer.wrap(b)
            case other => other.asInstanceOf[AnyRef]
          }
        rec.put(f.name, v)
      }
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      frame(schemaId, out.toByteArray)
    }
  }

  /** Avro GenericRecord -> Spark Row, by reader-schema field name. */
  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.map { f =>
      rec.get(f.name) match {
        case null => null
        case u: org.apache.avro.util.Utf8 => u.toString
        case bb: ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case other => other
      }
    }.toSeq)

  /** Serializable decoder closure: framed bytes -> Spark Row.
    *
    * The frame's schema id is CHECKED, not ignored: decoding a payload
    * written under an evolved writer schema with a stale reader schema
    * silently misdecodes field-by-field (the corruption mode the Confluent
    * frame exists to prevent). With `expectedSchemaId = Some(id)` any other
    * id is rejected (strict: throws; safe: nulls). With `None` the id is
    * accepted as-is — callers outside a registry deployment opt into
    * trusting their single schema. For real schema EVOLUTION — payloads
    * written under several registered schema versions — use
    * [[fromConfluentAvroRegistry]], which resolves each id against an
    * injected registry snapshot with zero network.
    */
  private final class Decoder(json: String, st: StructType,
      expectedSchemaId: Option[Int])
      extends UDF1[Array[Byte], Row] with Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(json)
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    override def call(payload: Array[Byte]): Row = {
      if (payload == null) return null
      val (id, body) = unframe(payload)
      expectedSchemaId.foreach { want =>
        if (id != want) throw new IllegalArgumentException(
          s"Confluent schema id mismatch: payload written with id=$id, " +
            s"decoder expects id=$want (use fromConfluentAvroRegistry for evolved schemas)")
      }
      val dec = DecoderFactory.get().binaryDecoder(body, null)
      val rec = reader.read(null, dec)
      recordToRow(rec, st)
    }
  }

  /** Registry-aware decoder: resolves each payload's writer schema by the
    * frame's id from an injected id -> schema-JSON snapshot and reads it
    * through Avro reader/writer RESOLUTION (GenericDatumReader with
    * distinct writer and reader schemas — ResolvingDecoder underneath).
    * This is the reference consumer's semantics (the registry client
    * resolves the writer schema per message id before decoding) minus the
    * network: renamed-with-alias, added-with-default and dropped fields
    * all decode correctly under the reader schema, and an id absent from
    * the snapshot is REJECTED rather than misdecoded.
    *
    * One resolving reader is built per distinct id per executor (lazy
    * transient map), never per row.
    */
  private final class RegistryDecoder(readerJson: String, st: StructType,
      writerSchemasById: Map[Int, String])
      extends UDF1[Array[Byte], Row] with Serializable {
    @transient private lazy val readers: Map[Int, GenericDatumReader[GenericRecord]] = {
      // one Parser per parse: versions share the record fullname, which a
      // single Parser would reject as a redefinition
      val readerSchema = new Schema.Parser().parse(readerJson)
      writerSchemasById.map { case (id, wj) =>
        id -> new GenericDatumReader[GenericRecord](
          new Schema.Parser().parse(wj), readerSchema)
      }
    }
    override def call(payload: Array[Byte]): Row = {
      if (payload == null) return null
      val (id, body) = unframe(payload)
      val reader = readers.getOrElse(id, throw new IllegalArgumentException(
        s"unknown Confluent schema id=$id: not in the injected registry " +
          s"snapshot (known ids: ${readers.keys.toSeq.sorted.mkString(", ")})"))
      val dec = DecoderFactory.get().binaryDecoder(body, null)
      recordToRow(reader.read(null, dec), st)
    }
  }

  /** UDF: struct column -> Confluent-framed Avro binary. */
  def toConfluentAvro(st: StructType, schemaId: Int, recordName: String): UserDefinedFunction =
    udf(new Encoder(avroSchemaJson(st, recordName), schemaId), BinaryType)

  /** UDF: encode under an EXPLICIT writer-schema JSON (field names must
    * exist in the input struct) framed with `schemaId` — the evolved-
    * producer path: a v2 writer emits v2-ordered bytes under the
    * registry id the v2 registration returned, while v1 consumers keep
    * resolving through [[fromConfluentAvroRegistry]].
    */
  def toConfluentAvroJson(writerSchemaJson: String, schemaId: Int): UserDefinedFunction =
    udf(new Encoder(writerSchemaJson, schemaId), BinaryType)

  /** Serializable permissive decoder: null row on any malformed payload
    * (frame or body), like from_json's PERMISSIVE mode — one poisoned
    * Kafka message must not kill a whole job at scale.
    */
  private final class SafeDecoder(json: String, st: StructType,
      expectedSchemaId: Option[Int])
      extends UDF1[Array[Byte], Row] with Serializable {
    private val strict = new Decoder(json, st, expectedSchemaId)
    override def call(payload: Array[Byte]): Row =
      try strict.call(payload)
      catch { case _: Exception => null }
  }

  /** UDF: Confluent-framed Avro binary -> struct column. Pass
    * `expectedSchemaId` to reject payloads framed under any other schema
    * id (see [[Decoder]]).
    */
  def fromConfluentAvro(st: StructType, recordName: String,
      expectedSchemaId: Option[Int] = None): UserDefinedFunction =
    udf(new Decoder(avroSchemaJson(st, recordName), st, expectedSchemaId), st)

  /** UDF: permissive decode — null instead of failing on bad payloads
    * (including schema-id mismatches when `expectedSchemaId` is set).
    */
  def fromConfluentAvroSafe(st: StructType, recordName: String,
      expectedSchemaId: Option[Int] = None): UserDefinedFunction =
    udf(new SafeDecoder(avroSchemaJson(st, recordName), st, expectedSchemaId), st)

  /** UDF: registry-aware decode with per-id writer-schema resolution.
    * `writerSchemasById` is the registry snapshot (id -> Avro schema JSON);
    * the reader schema is derived from `st` as usual. Payloads written
    * under any snapshot id decode through Avro schema resolution (added
    * fields with defaults, dropped fields, alias renames); unknown ids
    * throw.
    */
  def fromConfluentAvroRegistry(st: StructType, recordName: String,
      writerSchemasById: Map[Int, String]): UserDefinedFunction = {
    require(writerSchemasById.nonEmpty, "registry snapshot must contain at least one schema id")
    udf(new RegistryDecoder(avroSchemaJson(st, recordName), st, writerSchemasById), st)
  }

  /** Client-backed variant of [[fromConfluentAvroRegistry]]: resolve the
    * id -> writer-schema snapshot through a [[SchemaRegistry.Client]] at
    * PLAN time (driver-side; registry size is control-plane-bounded) and
    * decode through the same RegistryDecoder. Executors never touch the
    * registry — unlike the reference's per-message fetch + cache
    * (consumer.rs:76), a 1000-executor job issues zero registry requests
    * from the decode hot path. Restrict with `subjects` (empty = all).
    */
  def fromConfluentAvroRegistry(st: StructType, recordName: String,
      client: SchemaRegistry.Client, subjects: Seq[String]): UserDefinedFunction =
    fromConfluentAvroRegistry(st, recordName, client.snapshot(subjects))

  /** The reference producer's encode path (producer.rs:43-56): register
    * the frame schema under the TopicNameStrategy value subject, take the
    * registry-assigned global id, and frame every payload with it.
    * Registration happens ONCE, driver-side, at pipeline build.
    * @return (assignedSchemaId, encode UDF framing with that id)
    */
  def registerAndEncoder(client: SchemaRegistry.Client, topic: String,
      st: StructType, recordName: String): (Int, UserDefinedFunction) = {
    val json = avroSchemaJson(st, recordName)
    val id = client.register(SchemaRegistry.valueSubject(topic), json)
    (id, toConfluentAvro(st, id, recordName))
  }

  /** Encode convenience: `encodeCol(struct(cols...), schema, id, name)`. */
  def encodeCol(structCol: Column, st: StructType, schemaId: Int, recordName: String): Column =
    toConfluentAvro(st, schemaId, recordName)(structCol)

  def decodeCol(payload: Column, st: StructType, recordName: String,
      expectedSchemaId: Option[Int] = None): Column =
    fromConfluentAvro(st, recordName, expectedSchemaId)(payload)

  def decodeColSafe(payload: Column, st: StructType, recordName: String,
      expectedSchemaId: Option[Int] = None): Column =
    fromConfluentAvroSafe(st, recordName, expectedSchemaId)(payload)

  def decodeColRegistry(payload: Column, st: StructType, recordName: String,
      writerSchemasById: Map[Int, String]): Column =
    fromConfluentAvroRegistry(st, recordName, writerSchemasById)(payload)

  /** Permissive registry decode: null row on malformed payloads AND on
    * schema ids outside the snapshot — for LONG-RUNNING streaming queries
    * where the snapshot is frozen at plan time: a producer registering a
    * NEW schema version mid-stream (or one poisoned message) must not
    * kill the query (the [[fromConfluentAvroSafe]] principle). The
    * operational model: count the nulls (a StreamingQueryListener metric),
    * and when they appear, restart the query — the checkpoint makes the
    * restart cheap and the fresh plan re-snapshots the registry. Strict
    * [[decodeColRegistry]] stays the default for bounded/batch reads,
    * where failing fast beats silently dropping rows.
    */
  private final class SafeRegistryDecoder(readerJson: String, st: StructType,
      writerSchemasById: Map[Int, String])
      extends UDF1[Array[Byte], Row] with Serializable {
    private val strict = new RegistryDecoder(readerJson, st, writerSchemasById)
    override def call(payload: Array[Byte]): Row =
      try strict.call(payload)
      catch { case _: Exception => null }
  }

  def decodeColRegistrySafe(payload: Column, st: StructType, recordName: String,
      writerSchemasById: Map[Int, String]): Column = {
    require(writerSchemasById.nonEmpty,
      "registry snapshot must contain at least one schema id")
    udf(new SafeRegistryDecoder(
      avroSchemaJson(st, recordName), st, writerSchemasById), st)(payload)
  }
}
