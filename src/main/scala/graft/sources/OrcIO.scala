package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink (q141) — the second columnar format next to
  * parquet (the orc-core reader/writer ships in the Spark
  * distribution, no extra dependency). Schema-explicit reads, same
  * shape as [[JsonIO]]/[[CsvIO]]; ORC is self-describing, so the
  * explicit schema gates TYPE drift (a file whose physical types
  * stopped matching the contract fails the read instead of silently
  * widening).
  */
object OrcIO {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
