package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}
import graft.QueryHelpers._

/** Source/sink format family: JSONL, CSV, ORC, Avro OCF, WARC round-trips.
  *
  * Registry split out of SparkEntry (round 9): the maps below are
  * merged back into `SparkEntry.queries` / `SparkEntry.oracleSql`,
  * so names, semantics, and the DuckDB-oracle pairing are unchanged.
  */
object FormatQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSONL round-trip: parquet -> JSONL on disk -> schema'd read ->
    // per-source aggregate. The oracle computes the same aggregate from
    // the parquet directly, so any loss in the JSON write/read path
    // (encoding, nulls, type widening) breaks the hash.
    "q67_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q67_${math.abs(dir.hashCode)}"
      graft.sources.JsonIO.writeJsonl(docs, path)
      graft.sources.JsonIO.readJsonl(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),


    // CSV round-trip: parquet -> RFC-4180-escaped CSV -> schema'd read
    // -> per-source aggregate. The oracle aggregates the parquet
    // directly, so any loss in quoting/escaping/typing across the CSV
    // boundary breaks the hash (q67's JSONL contract, for CSV).
    "q75_csv_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q75_${math.abs(dir.hashCode)}"
      graft.sources.CsvIO.writeCsv(docs, path)
      graft.sources.CsvIO.readCsv(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),


    // ORC round-trip: parquet -> ORC on disk -> schema'd read ->
    // per-source aggregate (q67's contract on the second columnar
    // format; the oracle reads the parquet truth directly).
    // Avro OCF round-trip: parquet -> one container file per
    // partition -> schema-gated decode -> per-source aggregate
    // (q141's contract on the third ROW format; oracle reads the
    // parquet truth).
    "q168_avro_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q168_${math.abs(dir.hashCode)}"
      graft.sources.AvroFileIO.writeOcf(docs, path)
      graft.sources.AvroFileIO.readOcf(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),


    "q141_orc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q141_${math.abs(dir.hashCode)}"
      graft.sources.OrcIO.writeOrc(docs, path)
      graft.sources.OrcIO.readOrc(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),


    // WARC-style length-framed container round-trip (the web-crawl
    // ingest shape): parquet -> one container per partition ->
    // stream-parsed read -> per-source aggregate. sum_chars is
    // RECOMPUTED from the decoded payload (not carried metadata), so
    // the hash match certifies byte-exact payload framing.
    "q197_warc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q197_${math.abs(dir.hashCode)}"
      graft.sources.WarcIO.writeWarc(docs, path)
      graft.sources.WarcIO.readWarc(s, path)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),


    // Cross-format consistency audit: the same table written to and
    // read back from ALL four row/container formats (JSONL, ORC, Avro
    // OCF, WARC) must agree on the content digest — one query that
    // certifies the whole source tier jointly (a format-specific
    // corruption shows up as one divergent row).
    "q201_format_consistency" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q201_${math.abs(dir.hashCode)}"
      def digest(df: DataFrame, fmt: String) =
        df.agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long")).as("digest_sum"))
          .select(lit(fmt).as("format"), col("n_docs"), col("sum_chars"),
            col("n_texts"), col("digest_sum"))
      graft.sources.JsonIO.writeJsonl(docs, s"$base/jsonl")
      graft.sources.OrcIO.writeOrc(docs, s"$base/orc")
      graft.sources.AvroFileIO.writeOcf(docs, s"$base/avro")
      graft.sources.WarcIO.writeWarc(docs, s"$base/warc")
      digest(graft.sources.JsonIO.readJsonl(s, s"$base/jsonl", docs.schema),
          "jsonl")
        .unionByName(digest(
          graft.sources.OrcIO.readOrc(s, s"$base/orc", docs.schema), "orc"))
        .unionByName(digest(graft.sources.AvroFileIO
          .readOcf(s, s"$base/avro", docs.schema), "avro"))
        .unionByName(digest(
          graft.sources.WarcIO.readWarc(s, s"$base/warc"), "warc"))
        .orderBy("format")
    }),
  )

  /** DuckDB oracle SQL for every query above (same keys). */
  val oracleSql: Map[String, String] = Map(

    // q67: the engine's JSONL round-trip must reproduce the parquet
    // truth exactly.
    "q67_jsonl_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // q75: the CSV round-trip must reproduce the parquet truth exactly.
    "q75_csv_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // q168: the Avro-OCF round-trip must reproduce the parquet truth
    // exactly (q141's contract, third row format).
    "q168_avro_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // q141: the ORC round-trip must reproduce the parquet truth
    // exactly (q67's contract, second columnar format).
    "q141_orc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // q197: the WARC round-trip must reproduce the parquet truth,
    // char counts recomputed from the decoded payload.
    "q197_warc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(length(text))::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // q201: every format row must equal the parquet truth — the
    // oracle emits the same digest four times.
    "q201_format_consistency" ->
      """WITH d AS (
        |  SELECT count(*)::BIGINT AS n_docs,
        |         sum(length(text))::BIGINT AS sum_chars,
        |         count(DISTINCT md5(text))::BIGINT AS n_texts,
        |         sum(('0x' || substring(md5(text), 1, 8))::BIGINT)::BIGINT
        |           AS digest_sum
        |  FROM documents)
        |SELECT f.format, n_docs, sum_chars, n_texts, digest_sum
        |FROM (VALUES ('avro'), ('jsonl'), ('orc'), ('warc')) f(format), d
        |ORDER BY f.format""".stripMargin,
  )
}
