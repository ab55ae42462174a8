package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Budget-resilient by construction (the r8 artifact came back empty because
  * the sequential dump outgrew the driver's time budget):
  *   1. oracle_sql.json is written FIRST — a mid-dump kill leaves a
  *      truncated-but-usable artifact instead of an empty one.
  *   2. Queries run cheapest-first (cost map from BENCH.json via
  *      [[QueryCosts]]), so a cut loses only the most expensive tail.
  *   3. Queries run concurrently on a fixed thread pool over one
  *      SparkSession (FAIR scheduler) — Spark schedules concurrent jobs
  *      across the local[N] slots; wall-clock drops ~6× vs sequential.
  *   4. repartition(1) instead of coalesce(1): the final single-file write
  *      no longer collapses the upstream stages to one thread.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dev loop: SPARK_GRAFT_ONLY=q121,q122 restricts the dump to queries
    // whose name starts with any listed prefix. Unset for the driver run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // SQL scoped to the SELECTED queries (the full map when ONLY is
    // unset, i.e. every driver run): check_oracle now checks the union
    // of dumps and declared SQL, so emitting SQL for un-dumped queries
    // would turn every ONLY-restricted dev run into a wall of NO-OUTPUT.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val ordered = selected.toSeq.sortBy { case (n, _) =>
      (QueryCosts.sf01Seconds.getOrElse(n, 1.0), n) }

    // 8 concurrent queries fit comfortably in the 8 GiB dev heap; if
    // the driver launches this JVM smaller, scale the pool down rather
    // than risk trading the r8 empty-artifact failure for an OOM one
    val heapGib = Runtime.getRuntime.maxMemory().toDouble / (1L << 30)
    val defaultWorkers = if (heapGib >= 6.0) 8 else if (heapGib >= 3.0) 4 else 2
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS",
      defaultWorkers.toString).toInt
    val pool = Executors.newFixedThreadPool(workers)
    val done = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Output schema of every dumped query (name → "col:CATALYST_TYPE"),
    // written as schemas.json beside oracle_sql.json: type drift (e.g.
    // r9's decimal-vs-double q239) is then catchable by diffing
    // artifacts across rounds, not only by the driver's value hash.
    val schemas =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val t0 = System.nanoTime()
    ordered.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val tq = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            df.repartition(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            // schema recorded only AFTER a successful dump: schemas.json
            // must never carry an entry with no verified parquet behind
            // it (regenerating the schemas-baseline from a partially
            // failed run would otherwise bake unverified entries in)
            schemas.put(name,
              df.schema.fields.toSeq.map(f => s"${f.name}:${f.dataType.sql}"))
            val n = done.incrementAndGet()
            System.err.println(f"[verify] $n%3d/${ordered.size} $name " +
              f"${(System.nanoTime() - tq) / 1e9}%.1fs " +
              f"(elapsed ${(System.nanoTime() - t0) / 1e9}%.0fs)")
          } catch { case e: Throwable =>
            done.incrementAndGet()
            failures.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(24, TimeUnit.HOURS)
    val failed = {
      import scala.jdk.CollectionConverters._
      failures.asScala.toSeq.sorted
    }
    val schemaJson = {
      import scala.jdk.CollectionConverters._
      schemas.asScala.toSeq.sortBy(_._1).map { case (k, cols) =>
        s"${q(k)}: ${cols.map(q).mkString("[", ",", "]")}"
      }.mkString("{", ",", "}")
    }
    Files.writeString(Paths.get(s"$outDir/schemas.json"), schemaJson)
    // A truncated/partial dump must be detectable from THIS run, not
    // only from check_oracle's NO-OUTPUT lines downstream: summary line
    // + a marker file when anything failed (exit stays 0 — the parquet
    // that did land is still a usable artifact for the driver).
    Files.writeString(Paths.get(s"$outDir/_verify_summary.json"),
      s"""{"total": ${ordered.size}, "ok": ${ordered.size - failed.size},""" +
        s""" "failed": ${failed.map(q).mkString("[", ",", "]")}}""")
    System.err.println(s"[verify] SUMMARY: ${ordered.size - failed.size}/" +
      s"${ordered.size} ok" +
      (if (failed.nonEmpty) s", FAILED: ${failed.mkString(", ")}" else ""))
    spark.stop()
  }
}
