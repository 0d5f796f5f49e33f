package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Append-only statement log — the graft analogue of the reference
  * server's WAL (/root/reference/server/commitlog.go: text format, one
  * statement per line, replay-on-boot applies each line in order).
  *
  * Like the reference's text format, entries must not contain raw
  * newlines (the grapho language has no escape for them in string
  * literals, so well-formed single statements are always single-line
  * after normalization). The log is driver-side metadata, exactly like
  * the catalog store — the DATA lives in parquet; the log exists so a
  * statement-driven deployment can reconstruct state.
  */
final class CommitLog(val path: Path) {

  /** Append one statement. The log is line-based, so the entry must be
    * a single line — callers (Interpreter.executeLogged) reject
    * statements the format cannot represent BEFORE applying them;
    * collapsing newlines here would silently corrupt string literals.
    * DSYNC: an entry reported appended survives a crash — the one
    * property a commit log exists to provide.
    */
  def append(statement: String): Unit = {
    val line = statement.trim
    require(!line.exists(c => c == '\n' || c == '\r'),
      "commit log entries must be single-line statements")
    if (line.nonEmpty)
      Files.write(path, (line + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.DSYNC)
  }

  /** Apply every non-blank logged statement in order (reference
    * commitlog.go:162 Replay).
    */
  def replay(apply: String => Unit): Unit =
    if (Files.exists(path))
      Files.readAllLines(path, StandardCharsets.UTF_8).asScala
        .map(_.trim).filter(_.nonEmpty).foreach(apply)
}

object CommitLog {
  /** Open (or create the parent of) `dataDir/commit.log`, mirroring the
    * reference's OpenCommitLog layout.
    */
  def open(dataDir: String): CommitLog = {
    val dir = Paths.get(dataDir)
    Files.createDirectories(dir)
    new CommitLog(dir.resolve("commit.log"))
  }
}
