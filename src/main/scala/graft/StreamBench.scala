package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.PriceAlertsStream

/** Streaming throughput benchmark: drives the full price-alerts
  * pipeline (stream-static broadcast join → tumbling-window agg →
  * threshold filter) from the built-in `rate` source into a noop sink
  * and reports steady-state processedRowsPerSecond.
  *
  * Context (BASELINE.md): the reference processes record-at-a-time
  * interpreted Java over Avro GenericRecord with a RocksDB get/put per
  * record, one stream thread. This measures the Spark pipeline's
  * micro-batch throughput on the same logical query.
  *
  * Usage: tools/run.sh graft.StreamBench [rowsPerSecond] [seconds]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    // default offered rate sits ABOVE the pipeline's ~17M rows/s
    // ceiling so the no-arg run measures the engine, not the source
    val rate = if (args.length > 0) args(0).toInt else 20000000
    val runSecs = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // rate source cast to the purchase shape: 200 products, qty 1-10
    val purchases = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", cpus)
      .load()
      .select(
        col("value").as("id"),
        (col("value") % 10 + 1).as("quantity"),
        (col("value") % 200).as("productid"),
        col("timestamp").as("ts"))
    val products = (0L until 200L)
      .map(i => (i, s"p$i", "d", (i % 40 + 1) * 10.0))
      .toDF("id", "name", "description", "price")

    val alerts = PriceAlertsStream.dslAlertsUpdate(purchases, products, threshold = 500.0)
    val q = alerts.writeStream
      .format("noop")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    Thread.sleep(runSecs * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    // steady state: skip the first third (warmup batches)
    val steady = progress.drop(progress.length / 3)
      .map(_.processedRowsPerSecond).filter(d => !d.isNaN && d > 0)
    val rps = if (steady.nonEmpty) steady.sum / steady.length else 0.0
    val peak = if (steady.nonEmpty) steady.max else 0.0
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.0f,"peak":$peak%.0f,"rate_limit":$rate,"batches":${progress.length},"unit":"rows/sec"}""")
    spark.stop()
  }
}
