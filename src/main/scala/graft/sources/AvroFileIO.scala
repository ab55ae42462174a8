package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink (q168) — the third row
  * format beside JSONL/CSV (and columnar ORC/parquet). The Spark
  * distribution ships avro-core but NOT the spark-avro connector, so
  * this runs the file tier the same way the Kafka serde tier runs
  * the frame tier: schema translation + record codec at the
  * `mapPartitions` seam, one OCF file per partition (the natural
  * shard unit — each task writes and reads whole containers, no
  * cross-task coordination). Reference: the serde boundary the
  * homework's Avro+Schema-Registry setup implies
  * (dsl/PriceAlertsApp.java's serde config); same recursive
  * schema-translation contract as `functions/AvroExpressions`.
  *
  * Supported Spark types: long, int, double, boolean, string —
  * enough for every fixture table; extend the two `match`es for
  * more.
  */
object AvroFileIO {

  private def avroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case other => sys.error(s"unsupported Avro field type: $other")
      }
      // nullable union, null FIRST (Avro's convention for a null
      // default) — Spark columns are nullable unless proven otherwise
      val t = Schema.createUnion(
        Schema.create(Schema.Type.NULL), base)
      new Schema.Field(f.name, t, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Write one OCF file per partition under `path` (local filesystem
    * only — the sink uses java.io directly, so on a multi-node cluster
    * each executor writes to its own local disk; route through a
    * distributed FS sink there).
    *
    * Overwrite is scoped to the sink's own output: only `part-*.avro`
    * files are removed, and the write REFUSES a non-empty directory
    * containing anything else — a mistyped path must never silently
    * destroy unrelated data.
    */
  def writeOcf(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema, "GraftRecord").toString
    val dir = ContainerFiles.prepareSinkDir("writeOcf", path, ".avro")
    df.queryExecution.toRdd // force analysis before the closure
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avSchema = new Schema.Parser().parse(schemaJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avSchema))
      writer.create(avSchema, new File(dir, f"part-$pid%05d.avro"))
      var n = 0L
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(avSchema)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, if (row.isNullAt(i)) null else row.get(i))
          }
          writer.append(rec)
          n += 1
        }
      } finally writer.close() // also on a mid-loop append failure
      Iterator.single(n)
    }.count()
    ()
  }

  /** Read every OCF file under `path` with an explicit expected
    * schema (the q141 type-drift gate: a container whose writer
    * schema stopped matching fails the decode, never widens).
    */
  def readOcf(spark: SparkSession, path: String,
              schema: StructType): DataFrame = {
    val files = ContainerFiles.listParts(path, ".avro")
    val fieldNames = schema.fields.map(_.name)
    val expectedJson = avroSchema(schema, "GraftRecord").toString
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { fp =>
        // the expected schema is the READER schema, so Avro's schema
        // resolution enforces the q141 drift gate the scaladoc
        // promises: a renamed/missing/retyped writer field FAILS the
        // decode. (GenericRecord.get(name) with no reader schema
        // returns null for unknown names — drift would silently yield
        // all-null columns instead of an error.)
        val expected = new Schema.Parser().parse(expectedJson)
        val reader = new DataFileReader[GenericRecord](
          new File(fp), new GenericDatumReader[GenericRecord](null, expected))
        val recs = reader.iterator().asScala.map { rec =>
          Row.fromSeq(fieldNames.toIndexedSeq.map { n =>
            rec.get(n) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
          })
        }
        // stream lazily; close on exhaustion AND on a decode failure
        // (the pre-r12 .toVector bounded one task's memory by the
        // whole container and leaked the handle on a thrown decode)
        var closed = false
        def closeNow(): Unit =
          if (!closed) { closed = true; reader.close() }
        // task completion is the backstop for early-stopping consumers
        // (limit/take, task kill) the exhaustion/failure paths miss
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeNow()))
        new Iterator[Row] {
          def hasNext: Boolean =
            if (closed) false
            else
              try { val h = recs.hasNext; if (!h) closeNow(); h }
              catch { case t: Throwable => closeNow(); throw t }
          def next(): Row =
            try recs.next()
            catch { case t: Throwable => closeNow(); throw t }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
