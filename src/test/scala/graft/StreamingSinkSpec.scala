package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IdempotentSink

/** The two sink-side delivery contracts the engine guarantees:
  *   - IdempotentSink: exactly-once output through an at-least-once
  *     foreachBatch channel (epoch-id commit markers), including a
  *     deliberately REPLAYED epoch and a torn unmarked write.
  *   - Trigger.AvailableNow: drain-everything-then-stop file ingest,
  *     with a second run over the same checkpoint processing ONLY new
  *     files — the scheduled-batch-catchup pattern (the production
  *     spelling of q92's incremental ingest).
  */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  case class Ev(id: Long, v: Double, ts: Timestamp)
  private def t(s: String) = Timestamp.valueOf(s)

  test("IdempotentSink: replayed epoch is a no-op, torn write is healed") {
    val out = tmp("graft-idem")
    val fn = IdempotentSink.write(out) _
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    fn(b0, 0L)
    // at-least-once replay of the SAME epoch: must not duplicate
    fn(b0, 0L)
    fn(Seq((3L, "c")).toDF("k", "s"), 1L)
    val got = IdempotentSink.readCommitted(spark, out)
      .select("k", "s").collect().map(_.mkString("|")).sorted.toSeq
    assert(got == Seq("1|a", "2|b", "3|c"), s"got $got")

    // torn write: epoch dir exists WITHOUT marker → replay overwrites it
    val torn = new org.apache.hadoop.fs.Path(out, "batch_id=2")
    val fs = torn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(torn)
    fs.create(new org.apache.hadoop.fs.Path(torn, "part-garbage.parquet")).close()
    assert(IdempotentSink.readCommitted(spark, out).count() == 3) // unmarked dir invisible
    fn(Seq((4L, "d")).toDF("k", "s"), 2L)
    val after = IdempotentSink.readCommitted(spark, out)
      .select("k", "s").collect().map(_.mkString("|")).sorted.toSeq
    assert(after == Seq("1|a", "2|b", "3|c", "4|d"), s"got $after")
  }

  test("IdempotentSink under kill/resume: aggregated upsert stream, no dupes") {
    val out = tmp("graft-idem-q")
    val cp = tmp("graft-idem-cp")
    val in = MemoryStream[Ev]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("id"))
      .agg(sum(col("v")).as("total"))
      .select(col("id"), col("window.start").as("ws"), col("total"))

    def start() = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", cp)
      .foreachBatch(IdempotentSink.write(out) _)
      .start()

    var q = start()
    in.addData(Ev(1L, 1.0, t("2024-01-01 00:00:10")),
               Ev(1L, 2.0, t("2024-01-01 00:00:20")))
    q.processAllAvailable()
    q.stop()
    q = start() // kill + resume from the same checkpoint
    in.addData(Ev(1L, 4.0, t("2024-01-01 00:00:30")))
    q.processAllAvailable()
    q.stop()

    // update-mode emits refinements per epoch; last-epoch-wins per key
    // is the reader-side contract (batch_id is the partition column)
    val rows = IdempotentSink.readCommitted(spark, out)
    val last = rows
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id", "ws").orderBy(col("batch_id").desc)))
      .filter(col("rk") === 1)
      .select("id", "total").collect().map(_.mkString("|")).toSeq
    assert(last == Seq("1|7.0"), s"got $last")
  }

  test("Trigger.AvailableNow: drains existing files then stops; second run reads only new files") {
    val src = tmp("graft-an-src")
    val out = tmp("graft-an-out")
    val cp = tmp("graft-an-cp")
    Seq((1L, "x"), (2L, "y")).toDF("k", "s")
      .write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", cp).option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query must self-terminate")
    }
    run()
    assert(spark.read.parquet(out).count() == 2)

    // add one new file; the re-run must pick up ONLY it (offsets in cp)
    Seq((3L, "z")).toDF("k", "s").write.mode("append").parquet(src)
    run()
    val got = spark.read.parquet(out).select("k", "s")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got == Seq("1|x", "2|y", "3|z"), s"got $got")
  }
}
