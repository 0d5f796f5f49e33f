package graft.store

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Append-only statement log — the graft analogue of the reference
  * server's WAL (/root/reference/server/commitlog.go). The reference
  * supports two on-disk encodings of the same replay contract
  * (commitlog.go:27-32 LogFormatText | LogFormatBinary); so does graft:
  *
  *   - [[CommitLog.Text]]: one statement per line (commitlog.go:133).
  *     A raw newline inside a string literal cannot be framed, so
  *     callers (Interpreter.executeLogged) reject such statements
  *     BEFORE applying them.
  *   - [[CommitLog.Binary]]: 4-byte big-endian length header followed
  *     by the UTF-8 statement bytes (commitlog.go:121-131). Framing is
  *     explicit, so entries MAY contain raw newlines — the lexer
  *     accepts them inside string literals; only the text framing
  *     couldn't.
  *
  * Replay semantics are format-independent (commitlog.go:160 Replay):
  * every entry is whitespace-trimmed, blanks are skipped, and `apply`
  * runs in append order. A log is read with the format it was written
  * with — like the reference, the format is a deployment flag
  * (cmd/server/main.go:43), not self-describing file magic.
  *
  * The log is driver-side metadata, exactly like the catalog store —
  * the DATA lives in parquet; the log exists so a statement-driven
  * deployment can reconstruct state.
  */
final class CommitLog(val path: Path,
    val format: CommitLog.Format = CommitLog.Text) {

  /** Append one statement. DSYNC: an entry reported appended survives
    * a crash — the one property a commit log exists to provide.
    *
    * Text: the entry must be a single line — collapsing newlines here
    * would silently corrupt string literals, so multi-line input is a
    * hard error (callers check loggability before executing).
    * Binary: any statement up to the reference's 10 MB record guard.
    */
  def append(statement: String): Unit = {
    val line = statement.trim
    if (line.nonEmpty) format match {
      case CommitLog.Text =>
        require(!line.exists(c => c == '\n' || c == '\r'),
          "text commit log entries must be single-line statements")
        Files.write(path, (line + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND,
          StandardOpenOption.DSYNC)
      case CommitLog.Binary =>
        val b = line.getBytes(StandardCharsets.UTF_8)
        require(b.length <= CommitLog.MaxRecordBytes,
          s"commit log record exceeds ${CommitLog.MaxRecordBytes} bytes")
        val buf = ByteBuffer.allocate(4 + b.length)
        buf.putInt(b.length).put(b) // putInt is big-endian by default
        Files.write(path, buf.array(),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND,
          StandardOpenOption.DSYNC)
    }
  }

  /** Apply every non-blank logged statement in order (reference
    * commitlog.go:162 Replay). Binary: a partial length header at EOF
    * is a torn final append and ends replay cleanly (commitlog.go:169
    * treats EOF/ErrUnexpectedEOF on the header as end-of-log); a
    * partial BODY is corruption and throws (commitlog.go:181 returns
    * the error), as is a length outside [0, 10 MB] (commitlog.go:176).
    */
  def replay(apply: String => Unit): Unit =
    if (Files.exists(path)) format match {
      case CommitLog.Text =>
        Files.readAllLines(path, StandardCharsets.UTF_8).asScala
          .map(_.trim).filter(_.nonEmpty).foreach(apply)
      case CommitLog.Binary =>
        val in = new DataInputStream(
          new BufferedInputStream(Files.newInputStream(path), 64 << 10))
        try {
          var done = false
          while (!done) {
            val n =
              try Some(in.readInt())
              catch { case _: EOFException => None } // clean or torn header
            n match {
              case None => done = true
              case Some(len) =>
                if (len < 0 || len > CommitLog.MaxRecordBytes)
                  throw new IllegalStateException(
                    s"invalid commit log record length: $len")
                val buf = new Array[Byte](len)
                in.readFully(buf) // partial body = corruption: throws EOFException
                val line = new String(buf, StandardCharsets.UTF_8).trim
                if (line.nonEmpty) apply(line)
            }
          }
        } finally in.close()
    }

  /** Number of replayable entries — the compaction policy's unit (the
    * text line count generalized to binary frames).
    */
  def entryCount: Int = {
    var n = 0
    replay(_ => n += 1)
    n
  }
}

object CommitLog {
  /** On-disk encoding (reference commitlog.go:28 LogFormat). */
  sealed trait Format
  case object Text extends Format
  case object Binary extends Format

  /** Reference replay guard: a claimed record length past this is
    * corruption, not data (commitlog.go:176 `n > 10<<20`).
    */
  val MaxRecordBytes: Int = 10 << 20

  /** Open (or create the parent of) `dataDir/commit.log`, mirroring the
    * reference's OpenCommitLog layout (text) /
    * OpenCommitLogWithFormat (explicit format).
    */
  def open(dataDir: String, format: Format = Text): CommitLog = {
    val dir = Paths.get(dataDir)
    Files.createDirectories(dir)
    new CommitLog(dir.resolve("commit.log"), format)
  }
}
