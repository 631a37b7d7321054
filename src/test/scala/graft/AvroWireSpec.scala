package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AvroWire
import org.scalatest.funsuite.AnyFunSuite

/** The native Avro wire serde pair (AvroEncode/AvroDecode): identity on
  * edge values the fixture cannot supply, codegen health, and the
  * wire-format property the registered `fn_avro_roundtrip` row's oracle
  * implies but a reviewer should see asserted directly. */
class AvroWireSpec extends AnyFunSuite {
  import TestSpark._

  private def schemaFor(df: org.apache.spark.sql.DataFrame,
      field: String): String = {
    val f = df.schema(field)
    org.apache.spark.sql.avro.SchemaConverters
      .toAvroType(f.dataType, f.nullable, "rec", "").toString
  }

  private def roundtrip(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val json = schemaFor(df, "rec")
    df.select(col("id"), AvroWire.toAvro(col("rec"), json).as("wire"))
      .select(col("id"), AvroWire.fromAvro(col("wire"), json).as("rec"))
  }

  test("round-trip is identity on nulls, empty and non-ASCII strings") {
    import spark.implicits._
    // null field values, empty string, multi-byte UTF-8 (2/3/4-byte
    // sequences), negative zigzag-varint longs, IEEE specials
    val in = Seq(
      (1L, Some(0L), Some(""), Some(0.0)),
      (2L, Some(-1L), Some("héllo wörld"), Some(-0.0)),
      (3L, None: Option[Long], Some("日本語テキスト"), None: Option[Double]),
      (4L, Some(Long.MinValue), Some("emoji 😀 tail"),
        Some(Double.MaxValue)),
      (5L, Some(Long.MaxValue), None: Option[String],
        Some(Double.MinPositiveValue)))
      .toDF("id", "k", "s", "v")
      .select(col("id"), struct(col("k"), col("s"), col("v")).as("rec"))
    val out = roundtrip(in)
      .select(col("id"), col("rec.k"), col("rec.s"), col("rec.v"))
    val got = out.collect().map(_.toString).sorted.toSeq
    val expected = in
      .select(col("id"), col("rec.k"), col("rec.s"), col("rec.v"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected, s"serde not identity:\n$got\nvs\n$expected")
  }

  test("expressions survive whole-stage codegen (no fallback)") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val in = Seq((1L, 10L, "a"), (2L, 20L, "b"))
        .toDF("id", "k", "s")
        .select(col("id"), struct(col("k"), col("s")).as("rec"))
      val n = roundtrip(in).filter(col("rec.k") > 0).count()
      assert(n == 2)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("the wire bytes ARE Avro binary: a plain avro reader decodes them") {
    // Not just self-inverse — the bytes must be the standard format a
    // NON-Spark consumer (schema-registry client, Kafka consumer, avro
    // CLI) can read. Decode one record with the vanilla avro library and
    // compare fields.
    import spark.implicits._
    val in = Seq((7L, 42L, "wire-check"))
      .toDF("id", "k", "s")
      .select(col("id"), struct(col("k"), col("s")).as("rec"))
    val json = schemaFor(in, "rec")
    val bytes = in.select(AvroWire.toAvro(col("rec"), json).as("wire"))
      .collect()(0).getAs[Array[Byte]]("wire")
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val reader =
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](schema)
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(bytes, 0, bytes.length, null)
    val rec = reader.read(null, dec)
    assert(rec.get("k") == 42L, s"k: ${rec.get("k")}")
    assert(rec.get("s").toString == "wire-check", s"s: ${rec.get("s")}")
  }
}
