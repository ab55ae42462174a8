package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Plan dumps for query FRAGMENTS that Explain cannot show because the
  * full query materializes an intermediate eagerly (localCheckpoint /
  * distributedCumSum), leaving only a Scan ExistingRDD in the final
  * plan. Each named fragment reconstructs the exact pre-materialization
  * prefix of its query so the optimization evidence (Exchange count,
  * join strategy) is committable. Dev tooling only — not part of the
  * declared query surface or the bench.
  */
object ExplainFrag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (f <- args) {
      println(s"\n########## $f ##########")
      f match {
        case "q246_perpart" =>
          // the q246 prefix up to (but not including) distributedCumSum
          // — the stage the r17 repartition(l_partkey) change targets
          Tables.lineitem(spark, dir)
            .join(Tables.orders(spark, dir)
              .select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
            .repartition(col("l_partkey"))
            .groupBy(col("l_partkey"),
              date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
            .agg(sum(col("l_quantity").cast("long")).as("q_m"),
              sum(floor(col("l_extendedprice") * 100 + lit(0.5))
                .cast("long")).as("rev_m"))
            .groupBy(col("l_partkey"))
            .agg(count(lit(1)).as("n_m"), sum(col("q_m")).as("sq"),
              sum(col("q_m") * col("q_m")).as("sq2"),
              sum(col("rev_m")).as("rev_c"))
            .explain("formatted")
        case "q246_perpart_before" =>
          // the r16 shape of the same prefix (no repartition): two
          // exchanges — (l_partkey, mon), then l_partkey — kept here so
          // the before/after plan pair is reproducible from one build
          Tables.lineitem(spark, dir)
            .join(Tables.orders(spark, dir)
              .select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_partkey"),
              date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
            .agg(sum(col("l_quantity").cast("long")).as("q_m"),
              sum(floor(col("l_extendedprice") * 100 + lit(0.5))
                .cast("long")).as("rev_m"))
            .groupBy(col("l_partkey"))
            .agg(count(lit(1)).as("n_m"), sum(col("q_m")).as("sq"),
              sum(col("q_m") * col("q_m")).as("sq2"),
              sum(col("rev_m")).as("rev_c"))
            .explain("formatted")
        case other =>
          println(s"unknown fragment: $other")
      }
    }
  }
}
