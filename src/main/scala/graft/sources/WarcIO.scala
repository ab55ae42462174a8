package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC-style length-framed record container source/sink (q197) — the
  * web-crawl shape every large text-corpus pipeline ingests (Common
  * Crawl's WARC/WET): a container file is a concatenation of records,
  * each a header block of `name: value` lines ending with a blank
  * line, then exactly `content-length` payload BYTES (so payloads may
  * contain newlines, record markers, anything), then a blank line.
  * Parsing is length-driven — never a regex over the payload.
  *
  * Same seam discipline as [[AvroFileIO]]/the media codecs: one
  * container per partition, framing code at mapPartitions, everything
  * above it ordinary columns. Reads are streamed record-by-record
  * (never whole-file materialization) so a container is bounded by
  * its largest RECORD, not its size.
  *
  * Record grammar (version-pinned so readers can reject drift):
  * {{{
  *   GRAFT-WARC/1.0\n
  *   doc-id: <long>\n
  *   lang: <string>\n
  *   source: <string>\n
  *   content-length: <byte count of the utf-8 payload>\n
  *   \n
  *   <payload bytes>\n
  *   \n
  * }}}
  */
object WarcIO {

  private val Magic = "GRAFT-WARC/1.0"

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** A header value that could corrupt record framing fails the write
    * loudly (mirrors the reader's magic-line/truncation philosophy):
    * the payload is length-framed, but header values are line-framed,
    * so a newline or CR inside lang/source would make readWarc
    * mis-parse the container. Empty values are VALID — "lang: " parses
    * back as "" (the reader splits on ": "), so only the actual framing
    * hazard (line breaks) and null (unwritable) are rejected.
    */
  private def headerValue(field: String, v: String): String = {
    require(v != null, s"writeWarc: null $field")
    require(!v.exists(c => c == '\n' || c == '\r'),
      s"writeWarc: $field contains a line break: ${v.take(40)}...")
    v
  }

  /** Write one container per partition under `path` (local filesystem
    * only — java.io sink; see AvroFileIO.writeOcf). Input needs
    * (doc_id, lang, source, text).
    *
    * Overwrite is scoped to the sink's own output: only `*.warc` files
    * are removed, and the write REFUSES a directory containing anything
    * else — a mistyped path must never silently destroy unrelated data.
    */
  def writeWarc(df: DataFrame, path: String): Unit = {
    val dir = ContainerFiles.prepareSinkDir("writeWarc", path, ".warc")
    val cols = Seq("doc_id", "lang", "source", "text")
    val projected = df.selectExpr(cols: _*)
    projected.queryExecution.toRdd // force analysis before the closure
    projected.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val out = new BufferedOutputStream(
        new FileOutputStream(new File(dir, f"part-$pid%05d.warc")))
      val nl = "\n".getBytes(StandardCharsets.UTF_8)
      var n = 0L
      try {
        rows.foreach { row =>
          // same loud diagnostics as headerValue: a bare getLong/
          // getString on a null cell would die as an unlocated NPE
          // deep in the partition loop
          require(!row.isNullAt(0), "writeWarc: null doc_id")
          require(!row.isNullAt(3), "writeWarc: null text")
          val payload = row.getString(3).getBytes(StandardCharsets.UTF_8)
          val header =
            s"""$Magic
               |doc-id: ${row.getLong(0)}
               |lang: ${headerValue("lang", row.getString(1))}
               |source: ${headerValue("source", row.getString(2))}
               |content-length: ${payload.length}
               |""".stripMargin + "\n"
          out.write(header.getBytes(StandardCharsets.UTF_8))
          out.write(payload)
          out.write(nl); out.write(nl)
          n += 1
        }
      } finally out.close() // also on a mid-loop require/IO failure
      Iterator.single(n)
    }.count()
    ()
  }

  /** Stream-parse every container under `path`. A magic-line mismatch
    * or a truncated payload fails loudly (format drift must never
    * silently truncate a corpus).
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val files = ContainerFiles.listParts(path, ".warc")
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { fp =>
        val in = new BufferedInputStream(new FileInputStream(fp))
        // line reader over the byte stream: headers are ASCII lines,
        // payloads are read as exact byte ranges
        def readLine(): String = {
          val sb = new java.io.ByteArrayOutputStream()
          var b = in.read()
          while (b != -1 && b != '\n') { sb.write(b); b = in.read() }
          if (b == -1 && sb.size() == 0) null
          else new String(sb.toByteArray, StandardCharsets.UTF_8)
        }
        val recs = Iterator.continually(readLine())
          .takeWhile(_ != null)
          .filter(_.nonEmpty) // skip inter-record blank lines
          .map { magic =>
            require(magic == Magic,
              s"not a $Magic record (got: ${magic.take(40)}) in $fp")
            var docId = 0L; var lang = ""; var source = ""; var len = -1
            var line = readLine()
            while (line != null && line.nonEmpty) {
              val i = line.indexOf(": ")
              require(i > 0, s"malformed header line: $line")
              val (k, v) = (line.substring(0, i), line.substring(i + 2))
              k match {
                case "doc-id" => docId = v.toLong
                case "lang" => lang = v
                case "source" => source = v
                case "content-length" => len = v.toInt
                case _ => () // unknown headers are forward-compatible
              }
              line = readLine()
            }
            require(len >= 0, s"record $docId missing content-length in $fp")
            val payload = new Array[Byte](len)
            var off = 0
            while (off < len) {
              val r = in.read(payload, off, len - off)
              require(r > 0, s"truncated payload for doc $docId in $fp")
              off += r
            }
            Row(docId, lang, source,
              new String(payload, StandardCharsets.UTF_8))
          }
        // stream the records lazily, closing the handle on exhaustion
        // AND on any parse failure: the pre-r12 `.toVector` held every
        // record of the container on one task (memory bounded by the
        // CONTAINER, contradicting the largest-RECORD contract above)
        // and leaked the file handle whenever a malformed record threw
        var closed = false
        def closeNow(): Unit =
          if (!closed) { closed = true; in.close() }
        // the exhaustion/failure paths below don't cover a consumer
        // that stops early (limit/take, task kill) — task completion
        // is the backstop that frees the handle in those cases
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeNow()))
        new Iterator[Row] {
          def hasNext: Boolean =
            if (closed) false
            else
              try { val h = recs.hasNext; if (!h) closeNow(); h }
              catch { case t: Throwable => closeNow(); throw t }
          def next(): Row =
            try recs.next()
            catch { case t: Throwable => closeNow(); throw t }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
