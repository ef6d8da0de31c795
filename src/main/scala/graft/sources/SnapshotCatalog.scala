package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → table-root catalog over [[SnapshotTable]] — the "what
  * tables exist" surface a deployment needs on top of the commit
  * protocol (the counterpart of a metastore / Unity / Glue entry,
  * filesystem-expressed). One file per table under the catalog dir:
  * the file name is the table name, the content is the table root
  * path. Registration is an ATOMIC create (createFile throws
  * EEXIST), so two writers racing to claim one name get exactly one
  * winner — on an object store this is the same conditional PUT the
  * CommitBackend doc maps; a cloud catalog implements exactly this
  * one primitive plus a list.
  *
  * Reads resolve name → root, then go through SnapshotTable.read, so
  * every catalog read inherits the snapshot-isolation / time-travel
  * contract. `registerViews` additionally surfaces every catalog
  * entry as a Spark temp view, making the whole catalog queryable by
  * name from `spark.sql` (the `SELECT * FROM sales` UX).
  */
object SnapshotCatalog {

  private def entry(catalogDir: String, name: String): Path = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"invalid table name '$name' (identifier chars only)")
    Paths.get(catalogDir, name)
  }

  /** Register `name` → `root`. Atomic: exactly one of two racing
    * registrations wins; the loser gets [[TableExists]].
    */
  def register(catalogDir: String, name: String, root: String): Unit = {
    val target = entry(catalogDir, name) // validates the name FIRST
    Files.createDirectories(Paths.get(catalogDir))
    val tmp = Paths.get(catalogDir, s".tmp-$name-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, root)
    try Files.createLink(target, tmp)
    catch {
      case _: FileAlreadyExistsException =>
        throw new TableExists(s"table '$name' already exists in $catalogDir")
    } finally { Files.deleteIfExists(tmp); () }
  }

  final class TableExists(msg: String) extends RuntimeException(msg)
  final class NoSuchTable(msg: String) extends RuntimeException(msg)

  /** Resolve a name to its table root. */
  def rootOf(catalogDir: String, name: String): String = {
    val e = entry(catalogDir, name)
    if (!Files.exists(e))
      throw new NoSuchTable(s"table '$name' not found in $catalogDir")
    Files.readString(e).trim
  }

  /** Read a catalogued table (latest snapshot, or time-travel). */
  def table(spark: SparkSession, catalogDir: String, name: String,
      version: Int = -1): DataFrame =
    SnapshotTable.read(spark, rootOf(catalogDir, name), version)

  /** Commit `df` as the next version of a catalogued table,
    * registering the name on first use (root defaults to a directory
    * next to the catalog). Returns the committed version.
    */
  def saveAsTable(spark: SparkSession, catalogDir: String, name: String,
      df: DataFrame, readVersion: Int = -1): Int = {
    val root =
      try rootOf(catalogDir, name)
      catch {
        case _: NoSuchTable =>
          val r = Paths.get(catalogDir, s"_data-$name").toString
          register(catalogDir, name, r)
          r
      }
    SnapshotTable.commit(spark, root, df, readVersion = readVersion)
  }

  /** All (name, root) entries, name-sorted. */
  def tables(catalogDir: String): Seq[(String, String)] = {
    val dir = Paths.get(catalogDir)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith(".")
        && !p.getFileName.toString.startsWith("_"))
      .map(p => p.getFileName.toString -> Files.readString(p).trim)
      .toVector.sortBy(_._1)
    finally s.close()
  }

  /** Drop the NAME (the data and its version history stay on disk —
    * un-cataloguing is metadata-only, like an external-table DROP).
    */
  def drop(catalogDir: String, name: String): Unit = {
    Files.deleteIfExists(entry(catalogDir, name)); ()
  }

  /** Surface every catalog entry as a Spark temp view so the whole
    * catalog is one `spark.sql` namespace. Views resolve the CURRENT
    * snapshot at registration time; re-run after commits to advance
    * (a view is a plan, not a live pointer).
    */
  def registerViews(spark: SparkSession, catalogDir: String): Int = {
    val ts = tables(catalogDir)
    ts.foreach { case (name, root) =>
      SnapshotTable.read(spark, root).createOrReplaceTempView(name)
    }
    ts.size
  }
}
