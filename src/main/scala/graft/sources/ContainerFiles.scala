package graft.sources

import java.io.File

/** Shared local-filesystem plumbing for the container sinks/sources
  * (OCF, WARC): suffix-scoped overwrite preparation and part listing.
  * One definition, so the refuse-to-overwrite-foreign-data guard and
  * the suffix filter cannot drift between formats.
  */
private[sources] object ContainerFiles {

  /** Prepare `path` for a sink writing `*suffix` parts: REFUSE a
    * directory containing anything else (a mistyped path must never
    * silently destroy unrelated data), delete the prior parts, create
    * the directory if absent.
    */
  def prepareSinkDir(op: String, path: String, suffix: String): File = {
    val dir = new File(path)
    if (dir.exists()) {
      val files = Option(dir.listFiles()).getOrElse(Array.empty[File])
      val foreign = files.filterNot(_.getName.endsWith(suffix))
      require(foreign.isEmpty,
        s"$op: refusing to overwrite $path — contains non-$suffix " +
          s"entries: ${foreign.take(3).map(_.getName).mkString(", ")}")
      files.foreach(_.delete())
    } else dir.mkdirs()
    dir
  }

  /** Absolute paths of the `*suffix` parts under `path`. */
  def listParts(path: String, suffix: String): Seq[String] =
    Option(new File(path).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(suffix)).map(_.getAbsolutePath).toSeq
}
