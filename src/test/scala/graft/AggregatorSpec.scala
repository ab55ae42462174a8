package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("RevenueAggregator (the reference's init/adder pair) == built-in sum") {
    val revenue = udaf(Aggregators.RevenueAggregator,
      Encoders.product[Aggregators.QtyPrice])
    val df = Seq((2.0, 300.0), (100.0, 31.0), (1.0, 0.5))
      .toDF("quantity", "price")
    val r = df.agg(
      revenue(col("quantity"), col("price")).as("custom"),
      sum(col("quantity") * col("price")).as("builtin")).head
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) == 2.0 * 300.0 + 100.0 * 31.0 + 0.5)
  }

  test("WelfordVariance matches var_samp across partitions") {
    val welford = udaf(Aggregators.WelfordVariance, Encoders.scalaDouble)
    val df = (1 to 1000).map(_.toDouble * 1.7).toDF("x").repartition(7)
    val r = df.agg(
      welford(col("x")).as("custom"),
      var_samp(col("x")).as("builtin")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) /
      math.abs(r.getDouble(1)) < 1e-12)
  }

  test("aggregators respect groupBy partial/final split") {
    val revenue = udaf(Aggregators.RevenueAggregator,
      Encoders.product[Aggregators.QtyPrice])
    val df = Seq(("a", 2.0, 10.0), ("a", 3.0, 10.0), ("b", 1.0, 5.0))
      .toDF("k", "quantity", "price").repartition(4)
    val out = df.groupBy("k").agg(revenue(col("quantity"), col("price")).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 50.0, "b" -> 5.0))
  }
}
