package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{compact => jcompact, render}

/** Data-WAL snapshot generations — the compaction discipline the
  * catalog store already has (snapshot + bounded replay,
  * CatalogStore.loadAt) extended to the STATEMENT log: the reference
  * server replays the full commit log on boot
  * (/root/reference/server/commitlog.go:162); graft bounds that replay
  * by snapshotting the label tables and rolling the log to a new
  * generation.
  *
  * Layout under the data dir:
  *   snapshot-G/catalog.json      full catalog at compaction time
  *   snapshot-G/nodes/<label>/    parquet, one dir per node label
  *   snapshot-G/edges/<label>/    parquet, one dir per edge label
  *   snapshot-G/meta.json         {generation, nextId, nodes, edges}
  *   commit.G.log                 statements appended AFTER snapshot G
  *                                (generation 0 is plain commit.log)
  *
  * Crash safety by write ordering alone (no atomic directory replace
  * exists): meta.json is written LAST via an atomic rename, so a
  * generation without meta.json is invisible to [[latest]]; boot after
  * a crash mid-compaction falls back to the previous complete
  * generation + its full log — never a half state. Old generations are
  * deleted only after the new one is published.
  */
object Snapshot {

  final case class Meta(generation: Long, nextId: Long,
      nodes: Seq[String], edges: Seq[String])

  def snapDir(dataDir: String, gen: Long): Path =
    Paths.get(dataDir).resolve(s"snapshot-$gen")

  def logPath(dataDir: String, gen: Long): Path =
    if (gen == 0L) Paths.get(dataDir).resolve("commit.log")
    else Paths.get(dataDir).resolve(s"commit.$gen.log")

  /** The commit log of generation `gen` (creating the data dir). */
  def openLog(dataDir: String, gen: Long,
      format: CommitLog.Format = CommitLog.Text): CommitLog = {
    Files.createDirectories(Paths.get(dataDir))
    new CommitLog(logPath(dataDir, gen), format)
  }

  /** Highest COMPLETE generation (meta.json present), if any. */
  def latest(dataDir: String): Option[(Long, Meta)] = {
    val root = Paths.get(dataDir)
    if (!Files.isDirectory(root)) None
    else {
      val gens = Files.list(root).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("snapshot-") &&
          Files.exists(p.resolve("meta.json")))
        .flatMap(p => p.getFileName.toString.stripPrefix("snapshot-").toLongOption)
        .toSeq
      gens.maxOption.map(g => g -> readMeta(snapDir(dataDir, g)))
    }
  }

  def readMeta(dir: Path): Meta = {
    val j = JsonMethods.parse(Files.readString(dir.resolve("meta.json")))
    def strs(field: String): Seq[String] = j \ field match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    def num(field: String): Long = j \ field match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => throw new IllegalStateException(s"snapshot meta missing $field")
    }
    Meta(num("generation"), num("nextId"), strs("nodes"), strs("edges"))
  }

  /** Publish the generation: meta.json written to a temp name, then
    * atomically renamed — the commit point of the whole snapshot.
    */
  def publishMeta(dir: Path, meta: Meta): Unit = {
    val json = jcompact(render(JObject(
      "generation" -> JLong(meta.generation),
      "nextId" -> JLong(meta.nextId),
      "nodes" -> JArray(meta.nodes.map(JString(_)).toList),
      "edges" -> JArray(meta.edges.map(JString(_)).toList))))
    val tmp = dir.resolve("meta.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve("meta.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Remove all generations (and their logs) strictly older than
    * `keepGen` — called only after `keepGen` is published.
    */
  def dropOlderThan(dataDir: String, keepGen: Long): Unit = {
    val root = Paths.get(dataDir)
    if (Files.isDirectory(root)) {
      Files.list(root).iterator().asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        val gen: Option[Long] =
          if (name == "commit.log") Some(0L)
          else if (name.startsWith("snapshot-"))
            name.stripPrefix("snapshot-").toLongOption
          else if (name.startsWith("commit.") && name.endsWith(".log"))
            name.stripPrefix("commit.").stripSuffix(".log").toLongOption
          else None
        gen.filter(_ < keepGen).foreach(_ => deleteRecursively(p))
      }
    }
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
