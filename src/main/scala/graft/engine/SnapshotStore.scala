package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Snapshot-versioned table store over Parquet directories.
  *
  * The production design targets Iceberg (snapshot ids, appends, time
  * travel via `VERSION AS OF`); Iceberg's runtime jar is not available in
  * this sandbox, so this class emulates the *contract* the engine needs —
  * monotonically increasing snapshot ids, append-only snapshots, reads
  * pinned to a snapshot id — behind an interface an Iceberg catalog can
  * replace verbatim (`spark.read.option("snapshot-id", …).table(…)`).
  *
  * Layout: `root/<table>/snap-<id>/` parquet per append; `_snapshots` text
  * manifest, one id per line. A read at snapshot s = union of snap-0..s
  * (Iceberg append semantics).
  *
  * Reference analog: the Postgres state tables the checker re-reads every
  * batch (repository/SpecimenRepository.java:26-33) — externalized state,
  * no stream state store, which is exactly why runs are resumable.
  */
class SnapshotStore(root: String) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def manifest(table: String) = tableDir(table).resolve("_snapshots")

  def snapshots(table: String): Seq[Long] = {
    val m = manifest(table)
    if (!Files.exists(m)) Seq.empty
    else Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty).map(_.toLong).distinct.sorted
  }

  def currentSnapshotId(table: String): Option[Long] = snapshots(table).lastOption

  /** Append `df` as a new snapshot; returns the new snapshot id.
    *
    * Concurrency/crash safety: the parquet lands in a private temp dir
    * first, then an atomic directory rename claims the next free snapshot
    * id (rename onto an existing dir fails, so two concurrent writers can
    * never overwrite each other — the loser retries with the next id); the
    * manifest line is written only after the rename, so a crash mid-append
    * leaves at most an unreferenced temp/snap dir, never a manifest entry
    * pointing at missing or partial data. */
  def append(table: String, df: DataFrame): Long = {
    Files.createDirectories(tableDir(table))
    val tmp = tableDir(table).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    var id = currentSnapshotId(table).getOrElse(-1L) + 1L
    var claimed = false
    var attempts = 0
    while (!claimed) {
      try {
        Files.move(tmp, tableDir(table).resolve(s"snap-$id"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        claimed = true
      } catch {
        // A plain Files.move's target-exists check is non-atomic (TOCTOU):
        // a racing writer that passes the check loses the underlying
        // rename(2) with ENOTEMPTY — surfaced as DirectoryNotEmptyException
        // OR (observed on this kernel's UnixCopyFile.move path) a generic
        // FileSystemException with reason "Directory not empty" — not
        // FileAlreadyExistsException. All mean "id taken, try the next
        // one". ATOMIC_MOVE guarantees rename semantics (snap dirs are
        // never empty, so a loser can never silently replace a claim).
        case e: java.nio.file.FileSystemException
            if e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
               e.isInstanceOf[java.nio.file.DirectoryNotEmptyException] ||
               Option(e.getReason).exists(r =>
                 r.contains("Directory not empty") || r.contains("File exists")) =>
          attempts += 1
          if (attempts > 10000) throw e // persistent-fault backstop
          id += 1
      }
    }
    Files.write(manifest(table), s"$id\n".getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    id
  }

  /** Read the table as of `snapshot` (default: current). Append semantics:
    * state at s = union of all appends ≤ s. */
  def read(spark: SparkSession, table: String, snapshot: Option[Long] = None): DataFrame = {
    val ids = snapshots(table)
    require(ids.nonEmpty, s"table $table has no snapshots")
    val upTo = snapshot.getOrElse(ids.last)
    val dirs = ids.filter(_ <= upTo).map(i => tableDir(table).resolve(s"snap-$i").toString)
    // mergeSchema: snapshots appended by different engine versions may
    // carry different column sets (e.g. the lineage table gaining metric
    // columns). Default parquet inference samples ONE file, so new columns
    // could silently vanish on a mixed-era store; merged reads surface
    // every column, with nulls where an old snapshot lacks it.
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  def exists(table: String): Boolean = Files.exists(manifest(table))
}
