package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** S2 — driver-side ingest utility (GoNonratAnnotationPipeline.java:
  * 327-342, AllSpeciesFileSplitter.java:22-52): date-stamped archival of
  * source files with skip-if-current and same-size archive dedup. Not a
  * Spark operator (SURVEY.md §2.1): runs on the driver before the
  * cluster job, abstracted over a fetch function so the network transport
  * (FTP/HTTP in the reference) stays pluggable and testable.
  */
object IngestArchive {

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  final case class IngestResult(path: Path, downloaded: Boolean,
                                dedupedAgainst: Option[Path])

  /** Fetch `name` via `fetch` into `archiveDir/yyyyMMdd_name` unless that
    * file already exists and is non-empty (download-if-new). After a
    * fresh fetch, if the newest previous archive of the same name has the
    * same size, the new copy is dropped and the old one returned
    * (same-size archive dedup, AllSpeciesFileSplitter.java:38-49).
    */
  def ingest(archiveDir: String, name: String, today: LocalDate)
            (fetch: Path => Unit): IngestResult = {
    val dir = Paths.get(archiveDir)
    Files.createDirectories(dir)
    val target = dir.resolve(s"${today.format(fmt)}_$name")

    if (Files.exists(target) && Files.size(target) > 0)
      return IngestResult(target, downloaded = false, None)

    val tmp = dir.resolve(target.getFileName.toString + ".part")
    fetch(tmp)

    val previous = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(s"_$name") &&
        p != target && !p.getFileName.toString.endsWith(".part"))
      .toSeq.sortBy(_.getFileName.toString).reverse.headOption

    previous match {
      case Some(prev) if Files.size(prev) == Files.size(tmp) =>
        Files.delete(tmp)
        IngestResult(prev, downloaded = true, dedupedAgainst = Some(prev))
      case _ =>
        Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
        IngestResult(target, downloaded = true, None)
    }
  }
}
