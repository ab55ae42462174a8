package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro wire-format serde as native Catalyst expressions, built on the
  * avro *core* jar only (no spark-avro module needed) — the Spark
  * counterpart of the reference's GenericAvroSerde layer
  * (dsl/PriceAlertsApp.java:84-85, schemas at TestUtils.java:7-22).
  *
  * Scope: flat records of boolean/int/long/float/double/string/bytes,
  * the `timestamp-millis` logical type on long
  * (dsl/PriceAlertsApp.java:121-125 → Spark TimestampType, micros), and
  * `["null", T]` unions (nullable fields). Struct fields map to schema
  * fields BY POSITION.
  *
  * `confluentFraming` handles the Schema Registry wire format the
  * reference produces on Kafka: 1 magic byte (0) + 4-byte big-endian
  * schema id + Avro binary body.
  */
class AvroStructConverter(val schemaJson: String, val confluentFraming: Boolean,
                          val schemaId: Int,
                          val readerSchemaJson: Option[String] = None)
    extends Serializable {

  /** Writer schema — what the bytes were encoded with. */
  @transient private lazy val writerSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  /** Reader schema — possibly a pruned subset of the writer's fields
    * (Avro schema resolution skips non-reader fields during decode,
    * which is cheaper than materializing them).
    */
  @transient private lazy val schema: Schema =
    readerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(writerSchema)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](writerSchema, schema)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val decoderFactory = DecoderFactory.get()
  @transient private lazy val encoderFactory = EncoderFactory.get()

  private def unwrap(fs: Schema): (Schema, Boolean) = fs.getType match {
    case Schema.Type.UNION =>
      val branches = fs.getTypes
      require(branches.size == 2 && branches.get(0).getType == Schema.Type.NULL,
        s"only [null, T] unions supported, got $fs")
      (branches.get(1), true)
    case _ => (fs, false)
  }

  private def isTsMillis(s: Schema): Boolean =
    s.getType == Schema.Type.LONG && s.getLogicalType != null &&
      s.getLogicalType.getName == "timestamp-millis"

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => if (isTsMillis(s)) TimestampType else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** The Spark struct type this converter decodes to (reader schema). */
  lazy val structType: StructType = {
    // dataType runs on the driver too, so parse fresh (non-transient path)
    val parsed = new Schema.Parser().parse(readerSchemaJson.getOrElse(schemaJson))
    StructType(parsed.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      val (s, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(s), nullable)
    })
  }

  private val headerLen = if (confluentFraming) 5 else 0

  /** Avro binary (optionally Confluent-framed) -> InternalRow. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val decoder = decoderFactory.binaryDecoder(bytes, headerLen,
      bytes.length - headerLen, null)
    val rec = reader.read(null, decoder)
    val fields = schema.getFields
    val out = new Array[Any](fields.size)
    var i = 0
    while (i < fields.size) {
      val (fs, _) = unwrap(fields.get(i).schema())
      out(i) = fromAvroValue(rec.get(i), fs)
      i += 1
    }
    InternalRow.fromSeq(out.toSeq)
  }

  /** Permissive decode: malformed records become NULL instead of
    * failing the task — at corpus scale some corrupt records are a
    * certainty, and one poison message must not kill the stream.
    * (The FAILFAST counterpart is [[decode]].)
    */
  def decodeOrNull(bytes: Array[Byte]): InternalRow =
    try decode(bytes) catch {
      case _: java.io.IOException => null
      case _: org.apache.avro.AvroRuntimeException => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: java.nio.BufferUnderflowException => null
    }

  private def fromAvroValue(v: AnyRef, fs: Schema): Any = v match {
    case null => null
    case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
    case s: java.lang.CharSequence => UTF8String.fromString(s.toString)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case l: java.lang.Long => if (isTsMillis(fs)) l.longValue() * 1000L else l.longValue()
    case other => other
  }

  /** InternalRow (field order = schema order) -> Avro binary. */
  def encode(row: InternalRow): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    val fields = schema.getFields
    var i = 0
    while (i < fields.size) {
      val (fs, _) = unwrap(fields.get(i).schema())
      rec.put(i, toAvroValue(row, i, fs))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    if (confluentFraming) {
      bos.write(0)
      bos.write((schemaId >>> 24) & 0xff); bos.write((schemaId >>> 16) & 0xff)
      bos.write((schemaId >>> 8) & 0xff); bos.write(schemaId & 0xff)
    }
    val encoder = encoderFactory.binaryEncoder(bos, null)
    writer.write(rec, encoder)
    encoder.flush()
    bos.toByteArray
  }

  private def toAvroValue(row: InternalRow, i: Int, fs: Schema): AnyRef = {
    if (row.isNullAt(i)) return null
    fs.getType match {
      case Schema.Type.BOOLEAN => java.lang.Boolean.valueOf(row.getBoolean(i))
      case Schema.Type.INT => java.lang.Integer.valueOf(row.getInt(i))
      case Schema.Type.LONG =>
        val v = row.getLong(i)
        java.lang.Long.valueOf(if (isTsMillis(fs)) v / 1000L else v)
      case Schema.Type.FLOAT => java.lang.Float.valueOf(row.getFloat(i))
      case Schema.Type.DOUBLE => java.lang.Double.valueOf(row.getDouble(i))
      case Schema.Type.STRING => new Utf8(row.getUTF8String(i).getBytes)
      case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
  }
}

/** `from_avro_graft(binary)` — decode Avro binary into a struct.
  * `permissive = true` yields NULL for malformed records instead of
  * failing the task (spark-avro's PERMISSIVE vs FAILFAST modes).
  * `readerSchemaJson`, when set, is a pruned subset of the writer
  * schema — installed by the PruneAvroFields optimizer rule when the
  * query only extracts some fields.
  */
case class FromAvroGraft(child: Expression, schemaJson: String,
                         confluentFraming: Boolean = false,
                         permissive: Boolean = false,
                         readerSchemaJson: Option[String] = None)
    extends UnaryExpression {
  @transient private lazy val conv =
    new AvroStructConverter(schemaJson, confluentFraming, 0, readerSchemaJson)
  override def dataType: DataType =
    new AvroStructConverter(schemaJson, confluentFraming, 0, readerSchemaJson).structType
  override def nullable: Boolean = permissive || super.nullable
  override protected def nullSafeEval(input: Any): Any =
    if (permissive) conv.decodeOrNull(input.asInstanceOf[Array[Byte]])
    else conv.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroConv",
      new AvroStructConverter(schemaJson, confluentFraming, 0, readerSchemaJson),
      classOf[AvroStructConverter].getName)
    if (permissive) {
      // decodeOrNull can return null → set the null flag from the result
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $ref.decodeOrNull($c);
        ${ev.isNull} = (${ev.value} == null);""")
    } else {
      defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
    }
  }
  override protected def withNewChildInternal(c: Expression): FromAvroGraft =
    copy(child = c)
}

/** `to_avro_graft(struct)` — encode a struct as Avro binary (fields by
  * position), optionally with Confluent Schema Registry framing.
  */
case class ToAvroGraft(child: Expression, schemaJson: String,
                       confluentFraming: Boolean = false, schemaId: Int = 1)
    extends UnaryExpression {
  @transient private lazy val conv =
    new AvroStructConverter(schemaJson, confluentFraming, schemaId)
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    conv.encode(input.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroConv",
      new AvroStructConverter(schemaJson, confluentFraming, schemaId),
      classOf[AvroStructConverter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): ToAvroGraft =
    copy(child = c)
}
