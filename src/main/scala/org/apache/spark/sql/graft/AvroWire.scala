package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.avro.{AvroDeserializer, AvroSerializer}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Avro wire-format serde as native Catalyst expressions — the
  * `to_avro`/`from_avro` surface for this image. spark-sql 4.1.2 here
  * bundles the avro FILE format and its serde engine (`AvroSerializer`,
  * `AvroDeserializer`, `SchemaConverters` — all public API) but NOT the
  * external module's expression layer, so the built-in
  * `org.apache.spark.sql.avro.functions.to_avro` fails at resolution
  * with AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE. These two expressions
  * close that gap the way the engine's preference order prescribes
  * (built-ins > native Expression > UDF): thin per-row adapters over the
  * bundled serializer/deserializer, participating in whole-stage codegen
  * via a reference-object call (the loop stays codegen'd; the per-row
  * body is the same serde call the upstream module's expressions make).
  *
  * Both directions take ONE explicit Avro JSON schema so encode/decode
  * layout agreement is by construction; callers derive it from the
  * catalyst type with `SchemaConverters.toAvroType` (see
  * `fn_avro_roundtrip`), which also guarantees serializer compatibility
  * with nullable parquet-sourced fields.
  *
  * Scale: map-only, no shuffle, no driver round-trip; the binary wire
  * column exists only inside the plan. This is the value-serde path a
  * Kafka/stream-transport pipeline runs per record — the serde half of
  * the one transport this image cannot host (SURVEY §2.1).
  */
case class AvroEncode(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val avroType =
    new org.apache.avro.Schema.Parser().parse(jsonSchema)
  @transient private lazy val serializer =
    new AvroSerializer(child.dataType, avroType, child.nullable)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroType)
  @transient private var encoder: BinaryEncoder = _
  @transient private lazy val out = new ByteArrayOutputStream

  /** Public for the generated code's reference-object call. */
  def encode(input: Any): Array[Byte] = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override def nullSafeEval(input: Any): Any = encode(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("avroEncode", this)
      s"${ev.value} = $ref.encode($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

case class AvroDecode(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def prettyName: String = "graft_from_avro"
  // deserialize() may legitimately return None (malformed record under a
  // permissive config) — surface that as null, never a crash
  override def nullable: Boolean = true

  @transient private lazy val avroType =
    new org.apache.avro.Schema.Parser().parse(jsonSchema)

  override lazy val dataType: DataType =
    org.apache.spark.sql.avro.SchemaConverters.toSqlType(avroType).dataType

  @transient private lazy val deserializer = new AvroDeserializer(
    avroType, dataType,
    // no date/timestamp fields pre-Gregorian-switch in this engine's use;
    // CORRECTED is the modern no-rebase mode
    "CORRECTED",
    false, "_", -1)
  @transient private lazy val reader = new GenericDatumReader[Any](avroType)
  @transient private var decoder: BinaryDecoder = _
  @transient private var reuse: Any = _

  /** Public for the generated code's reference-object call. */
  def decode(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length,
      decoder)
    reuse = reader.read(reuse, decoder)
    deserializer.deserialize(reuse).orNull
  }

  override def nullSafeEval(input: Any): Any = decode(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("avroDecode", this)
      s"${ev.value} = (${org.apache.spark.sql.catalyst.expressions.codegen
        .CodeGenerator.boxedType(dataType)}) $ref.decode($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

object AvroWire {
  /** DataFrame-API surface: struct column → Avro binary. */
  def toAvro(c: Column, jsonSchema: String): Column =
    ExpressionUtils.column(AvroEncode(ExpressionUtils.expression(c),
      jsonSchema))

  /** DataFrame-API surface: Avro binary → struct column. */
  def fromAvro(c: Column, jsonSchema: String): Column =
    ExpressionUtils.column(AvroDecode(ExpressionUtils.expression(c),
      jsonSchema))
}
