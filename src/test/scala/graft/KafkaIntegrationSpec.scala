package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.KafkaIO

/** Live-broker integration for S1–S4/K1–K2 — the ONE permanently
  * environment-blocked partial (no broker, no spark-sql-kafka jar in
  * any offline cache). The suite is flag-gated so the moment the
  * environment unblocks it runs with zero code changes:
  *
  *   SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 sbt test
  *
  * Both gates must hold — the env var AND the connector on the
  * classpath (`format("kafka")` resolves at runtime, so this file
  * compiles without the jar). When either is absent every test is
  * CANCELED (not passed, not failed): the suite reports exactly why,
  * and `sbt test` stays green offline.
  *
  * Everything beneath the broker boundary (Confluent framing, Avro
  * decode/encode, per-record writer-schema resolution, corrupt-frame
  * policies, latest-per-key compaction) is already proven offline in
  * AvroSpec/PriceAlertsStreamingSpec; these tests only add the wire.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private def gate(): String = {
    assume(bootstrap.isDefined,
      "SPARK_GRAFT_KAFKA_BOOTSTRAP not set — no live broker in this environment")
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector not on the classpath")
    bootstrap.get
  }

  private def uniqueTopic(prefix: String): String =
    s"$prefix-${System.nanoTime()}"

  test("S2/K: batch round-trip — Avro-framed products to a topic and back via snapshot compaction") {
    val bs = gate()
    val topic = uniqueTopic("graft-products")
    graft.functions.GraftFunctions.register(spark)
    // two writes for id=1: compaction must keep the later one
    val products = Seq(
      (1L, "v1", "old", 10.0), (1L, "v2", "new", 20.0), (2L, "x", "only", 5.0))
    import spark.implicits._
    products.zipWithIndex.foreach { case ((id, name, desc, price), _) =>
      Seq((id, name, desc, price)).toDF("id", "name", "description", "price")
        .select(col("id").cast("string").as("key"),
          graft.functions.GraftFunctions.toAvro(
            struct(col("id"), col("name"), col("description"), col("price")),
            KafkaIO.productAvroSchema, confluentFraming = true).as("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bs)
        .option("topic", topic)
        .save()
    }
    val snap = KafkaIO.productsSnapshot(spark, bs, topic).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(snap(1L) == ("v2", 20.0), "latest-per-key must win")
    assert(snap(2L) == ("x", 5.0))
  }

  test("S1/K1: purchases stream end-to-end — subscribe, decode, window, alert to sink topic") {
    val bs = gate()
    val inTopic = uniqueTopic("graft-purchases")
    val outTopic = uniqueTopic("graft-alerts")
    val cp = Files.createTempDirectory("graft-kafka-cp").toFile.getAbsolutePath
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val stream = KafkaIO.purchasesStream(spark, bs, inTopic)
    val productsDim = Seq((7L, "prod", "d", 100.0))
      .toDF("id", "name", "description", "price")
    // output already carries (product_id, window_start,
    // total_sum_per_minute) — exactly alertsSink's contract
    val alerts = graft.streaming.PriceAlertsStream
      .dslAlertsUpdate(stream, productsDim, threshold = 50.0)
    val q = KafkaIO.alertsSink(alerts, bs, outTopic, cp)
      .outputMode("update").start()
    try {
      // produce AFTER the source has fixed its starting offsets: an
      // empty processAllAvailable forces the first micro-batch to plan
      // (resolving startingOffsets=latest) — no sleep race on a slow
      // broker / topic auto-creation
      q.processAllAvailable()
      Seq((1L, 5L, 7L)).toDF("id", "quantity", "productid")
        .select(lit(null).cast("string").as("key"),
          graft.functions.GraftFunctions.toAvro(
            struct(col("id"), col("quantity"), col("productid")),
            KafkaIO.purchaseAvroSchema, confluentFraming = true).as("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bs)
        .option("topic", inTopic)
        .save()
      // poll the sink topic until the alert lands (5*100=500 > 50)
      val deadline = System.currentTimeMillis() + 60000L
      var found = false
      while (!found && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000L)
        val rows = spark.read.format("kafka")
          .option("kafka.bootstrap.servers", bs)
          .option("subscribe", outTopic)
          .option("startingOffsets", "earliest")
          .load()
          .select(col("key").cast("string").as("key"),
            graft.functions.GraftFunctions.fromAvro(col("value"),
              KafkaIO.priceAlertAvroSchema, confluentFraming = true).as("a"))
          .select(col("key"), col("a.total_sum_per_minute").as("total"))
          .collect()
        found = rows.exists(r => r.getString(0) == "7" && r.getDouble(1) == 500.0)
      }
      assert(found, "alert (key=7, total=500.0) must reach the sink topic")
    } finally q.stop()
  }
}
