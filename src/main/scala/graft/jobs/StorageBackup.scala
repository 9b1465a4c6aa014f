package graft.jobs

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import graft.sources.ObjectStore
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream

import scala.jdk.CollectionConverters._
import scala.util.Try

/** S10 — day-partitioned storage backup + retention
  * (`siri/storage_backup_cleanup.py:13-73`): every `YYYY/MM/DD`
  * directory older than one week is (optionally) tar.bz2'd and uploaded
  * under `{backup_path_prefix}/{YYYY/MM/DD}.tar.bz2` with the `__N`
  * collision probe, then removed; month/year directories left empty are
  * pruned. The reference probes 7200 candidate dates against the
  * filesystem; here the existing day directories are walked directly —
  * same selection, one traversal.
  */
object StorageBackup {

  /** One retention root: backup before delete iff `backupPathPrefix`
    * is set (the reference's two-entry config list,
    * `storage_backup_cleanup.py:49-58`).
    */
  case class RootConfig(rootPath: String, backupPathPrefix: Option[String])

  case class Report(backedUp: Seq[String], removed: Seq[String])

  /** tar.bz2 of a directory with `./`-relative entry names (the
    * reference's `tar -jcvf backup.tar.bz2 .` run inside the day dir).
    */
  def tarBz2(sourceDir: Path, targetFile: Path): Path = {
    val out = new TarArchiveOutputStream(
      new BZip2CompressorOutputStream(Files.newOutputStream(targetFile)))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    val stream = Files.walk(sourceDir)
    try {
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .toSeq.sortBy(_.toString)
        .foreach { f =>
          val entry = new TarArchiveEntry(f.toFile,
            s"./${sourceDir.relativize(f).toString}")
          out.putArchiveEntry(entry)
          Files.copy(f, out)
          out.closeArchiveEntry()
        }
    } finally { stream.close(); out.close() }
    targetFile
  }

  /** Existing `YYYY/MM/DD` day directories under `root` dated at or
    * before `cutoff`, oldest first (the reference iterates
    * `last_week - d days` for d ≥ 0, so the cutoff day itself is
    * included, `storage_backup_cleanup.py:59-60`).
    */
  def expiredDayDirs(root: Path, cutoff: LocalDate): Seq[(Path, LocalDate)] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val fmt = DateTimeFormatter.ofPattern("yyyy/MM/dd")
    val stream = Files.walk(root, 3)
    try {
      stream.iterator().asScala
        .filter(Files.isDirectory(_))
        .flatMap { d =>
          val rel = root.relativize(d).toString.replace(java.io.File.separatorChar, '/')
          Try(LocalDate.parse(rel, fmt)).toOption.map(d -> _)
        }
        .filter(!_._2.isAfter(cutoff))
        .toSeq.sortBy(_._2)
    } finally stream.close()
  }

  def run(store: ObjectStore, roots: Seq[RootConfig],
          nowUtc: LocalDate): Report = {
    val cutoff = nowUtc.minusDays(7)
    var backedUp = Seq.empty[String]
    var removed = Seq.empty[String]
    roots.foreach { cfg =>
      val root = Paths.get(cfg.rootPath)
      expiredDayDirs(root, cutoff).foreach { case (dayDir, date) =>
        val prefix = date.format(DateTimeFormatter.ofPattern("yyyy/MM/dd"))
        cfg.backupPathPrefix.foreach { bp =>
          val tmp = Files.createTempFile("graft-backup", ".tar.bz2")
          tarBz2(dayDir, tmp)
          val key = ObjectStore.freeKey(store, s"$bp/$prefix.tar.bz2",
            n => s"$bp/${prefix}__$n.tar.bz2")
          store.put(tmp, key)
          Files.delete(tmp)
          backedUp :+= key
        }
        deleteRecursively(dayDir)
        removed :+= prefix
        // prune the month then year directory when left empty
        Seq(dayDir.getParent, dayDir.getParent.getParent).foreach { p =>
          val f = p.toFile
          if (f.isDirectory && Option(f.listFiles()).exists(_.isEmpty))
            Files.delete(p)
        }
      }
    }
    Report(backedUp, removed)
  }

  private def deleteRecursively(p: Path): Unit =
    ObjectStore.deleteRecursively(p.toFile)
}

/** S11 — copy the latest DB backup to a timestamp-dated object path
  * (`db/copy_backup_to_s3.py:8-26`): asserts the local
  * `stride_db_backup/stride_db.sql.gz` exists, then uploads it to
  * `stride_db_backups/YYYY/MM/DD/HHMMSS.sql.gz` (a fresh dated key per
  * run — no probe needed).
  */
object DbBackupCopy {

  def run(store: ObjectStore, storageRoot: String,
          nowUtc: java.time.LocalDateTime): String = {
    val local = Paths.get(storageRoot, "stride_db_backup/stride_db.sql.gz")
    require(Files.isRegularFile(local), s"missing local backup file: $local")
    val key = "stride_db_backups/" +
      nowUtc.format(DateTimeFormatter.ofPattern("yyyy/MM/dd/HHmmss")) + ".sql.gz"
    store.put(local, key)
  }
}
