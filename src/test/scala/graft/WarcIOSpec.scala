package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.WarcIO

/** q197: length-framed parsing must survive hostile payloads — record
  * markers and header-shaped lines INSIDE payload bytes, multi-line
  * text, empty documents — and reject drifted containers loudly.
  */
class WarcIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft-warc").toFile.getAbsolutePath

  test("round-trips payloads containing record markers and headers") {
    val hostile = Seq(
      (1L, "en", "s0", "plain text"),
      (2L, "de", "s0", "line one\nline two\n\nline after blank"),
      (3L, "en", "s1", "GRAFT-WARC/1.0\ndoc-id: 999\n\nfake record inside"),
      (4L, "fr", "s1", ""), // empty payload
      (5L, "en", "s1", "content-length: 12\ntrailing"),
      (6L, "es", "s2", "ünïcødé ✓ multibyte €"))
    val df = hostile.toDF("doc_id", "lang", "source", "text").repartition(3)
    val path = tmp()
    WarcIO.writeWarc(df, path)
    val back = WarcIO.readWarc(spark, path)
      .as[(Long, String, String, String)].collect().toSet
    assert(back == hostile.toSet)
  }

  test("header values with line breaks fail the write loudly") {
    val path = tmp()
    val bad = Seq((1L, "en\nx", "s0", "payload"))
      .toDF("doc_id", "lang", "source", "text")
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.writeWarc(bad, path)
    }
    assert(e.getMessage.contains("line break") ||
      Option(e.getCause).exists(_.getMessage.contains("line break")))
    // empty header values are legitimate data, not a framing hazard —
    // "source: " round-trips back to ""
    val empty = Seq((1L, "en", "", "payload"))
      .toDF("doc_id", "lang", "source", "text")
    val p2 = tmp()
    WarcIO.writeWarc(empty, p2)
    val back = WarcIO.readWarc(spark, p2)
      .as[(Long, String, String, String)].collect().toSet
    assert(back == Set((1L, "en", "", "payload")))
  }

  test("overwrite refuses a directory holding foreign files") {
    val path = tmp()
    Files.writeString(java.nio.file.Paths.get(path, "precious.txt"), "keep")
    val df = Seq((1L, "en", "s0", "payload"))
      .toDF("doc_id", "lang", "source", "text")
    val e = intercept[IllegalArgumentException] {
      WarcIO.writeWarc(df, path)
    }
    assert(e.getMessage.contains("refusing to overwrite"))
    assert(Files.exists(java.nio.file.Paths.get(path, "precious.txt")),
      "foreign file must survive the refused write")
    // a directory holding only *.warc from a previous run IS replaced
    val ok = tmp()
    WarcIO.writeWarc(df, ok)
    WarcIO.writeWarc(df, ok)
    assert(WarcIO.readWarc(spark, ok).count() == 1)
  }

  test("unknown headers are skipped; magic drift fails loudly") {
    val path = tmp()
    // hand-written container with an extra header the reader must skip
    val payload = "hello".getBytes("UTF-8")
    val rec = s"GRAFT-WARC/1.0\ndoc-id: 7\nlang: en\nsource: sX\n" +
      s"x-extra: future\ncontent-length: ${payload.length}\n\nhello\n\n"
    Files.write(new java.io.File(path, "part-00000.warc").toPath,
      rec.getBytes("UTF-8"))
    val back = WarcIO.readWarc(spark, path).collect()
    assert(back.length == 1 && back.head.getString(3) == "hello")

    val bad = tmp()
    Files.write(new java.io.File(bad, "part-00000.warc").toPath,
      "WARC/1.0\nnope\n\n".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.readWarc(spark, bad).collect()
    }
    assert(e.getMessage.contains("GRAFT-WARC") ||
      Option(e.getCause).exists(_.getMessage.contains("GRAFT-WARC")))
  }

  test("truncated payload fails loudly, never silently short-reads") {
    val path = tmp()
    val rec = "GRAFT-WARC/1.0\ndoc-id: 8\nlang: en\nsource: sX\n" +
      "content-length: 100\n\nonly a few bytes"
    Files.write(new java.io.File(path, "part-00000.warc").toPath,
      rec.getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.readWarc(spark, path).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"))
  }
}
