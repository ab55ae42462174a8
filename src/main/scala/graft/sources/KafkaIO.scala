package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Kafka wiring for the reference's topics (SURVEY.md §2.1 S1-S4,
  * §2.2 K1-K2). The offline harness has no broker and no
  * spark-sql-kafka connector jar, so these builders are the DEPLOYMENT
  * surface: they compile against the stable `format("kafka")` string
  * API and are exercised in production with the connector on the
  * classpath. Wire format here is JSON; the reference's Avro+Schema-
  * Registry serde maps to the spark-avro module's from_avro/to_avro
  * (same column-level contract) when that jar is deployed
  * (SURVEY.md §1.1 F1).
  */
object KafkaIO {

  /** Purchase payload schema (TestUtils.java:7-13). */
  val purchaseSchema: StructType =
    StructType.fromDDL("id LONG, quantity LONG, productid LONG")

  /** Product payload schema (TestUtils.java:15-22). */
  val productSchema: StructType =
    StructType.fromDDL("id LONG, name STRING, description STRING, price DOUBLE")

  /** S1/S3 — the purchases stream: subscribe, decode payload, surface
    * the Kafka record timestamp as the event-time column `ts` (the
    * reference reads record.timestamp(),
    * PurchaseQuantityAlertTrasformer.java:38).
    */
  def purchasesStream(spark: SparkSession, bootstrap: String,
                      topic: String = "purchases"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .select(from_json(col("value").cast("string"), purchaseSchema).as("p"),
        col("timestamp").as("ts"))
      .select(col("p.id").as("id"), col("p.quantity").as("quantity"),
        col("p.productid").as("productid"), col("ts"))

  /** S2/S4 — the products dimension: read the topic as a bounded batch
    * (earliest→latest) and compact to latest-per-key — the GlobalKTable
    * materialization. Re-run per deploy or wrapped in a refresh loop;
    * stream-static joins re-read the static side each micro-batch.
    */
  def productsSnapshot(spark: SparkSession, bootstrap: String,
                       topic: String = "products"): DataFrame = {
    val raw = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string").as("k"),
        from_json(col("value").cast("string"), productSchema).as("v"),
        col("timestamp").as("ts"))
    raw.groupBy(col("k"))
      .agg(max_by(struct(col("v.*"), col("ts")), col("ts")).as("latest"))
      .select(col("latest.id").as("id"), col("latest.name").as("name"),
        col("latest.description").as("description"), col("latest.price").as("price"))
  }

  /** K1/K2 — the alerts sink: key = product id string (the reference's
    * output Kafka key, dsl/PriceAlertsApp.java:117,132), value = JSON
    * alert record.
    */
  def alertsSink(alerts: DataFrame, bootstrap: String, topic: String,
                 checkpoint: String): DataStreamWriter[Row] =
    alerts
      .select(col("product_id").cast("string").as("key"),
        to_json(struct(col("window_start"), col("total_sum_per_minute")))
          .as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
