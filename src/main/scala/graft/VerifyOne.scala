package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Single-query variant of [[Verify]] for fast local iteration:
  * `VerifyOne <sfDir> <outDir> <query>...` dumps only the named
  * queries + their oracle SQL, in the same layout check_oracle.py
  * expects.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      // repartition(1), not coalesce(1) — same reasoning as Verify:
      // keep upstream stages parallel, still one file per query
      SparkEntry.queries(name)(spark, sfDir).repartition(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Emit SQL for every query dump PRESENT in outDir, not just this
    // invocation's names: two VerifyOne runs into the same outDir
    // otherwise leave the first run's parquet behind with no SQL entry,
    // silently downgrading its check to rows-only. The dump dirs are
    // the source of truth (each is a registry name by construction).
    val dumped = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && SparkEntry.oracleSql.contains(f.getName))
      .map(_.getName).toSet
    val json = SparkEntry.oracleSql
      .filter(kv => dumped.contains(kv._1) || names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
