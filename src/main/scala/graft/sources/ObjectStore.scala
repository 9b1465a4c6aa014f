package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S7 — the object-store edge every reference packager run crosses
  * (`packagers/common.py:14-71`: head_object / upload_file /
  * download_file / list_objects_v2 over an S3-compatible endpoint).
  *
  * The engine depends only on this interface; the sandbox binds it to
  * [[LocalFsObjectStore]], a production deployment binds the same five
  * operations to its S3-compatible client. Keys are `/`-separated,
  * bucket-relative — exactly the reference's `Key=` strings.
  */
trait ObjectStore {

  /** `head_object`-style existence probe (`packagers/common.py:25-32`). */
  def exists(key: String): Boolean

  /** Upload a local file; returns the object's public URL
    * (`packagers/common.py:35-37` returns endpoint/bucket/key).
    */
  def put(localFile: Path, key: String): String

  /** Download to a local file; false when the key is absent
    * (`packagers/common.py:44-52`'s 404 contract).
    */
  def get(key: String, localFile: Path): Boolean

  /** All non-empty objects under a prefix (`packagers/common.py:66-72`). */
  def list(prefix: String): Seq[String]

  /** Millis last-modified, None when absent (`packagers/common.py:25-32`). */
  def lastModified(key: String): Option[Long]

  /** The URL `put` would return for this key. */
  def url(key: String): String
}

/** Filesystem-rooted [[ObjectStore]] — the sandbox binding (and a
  * perfectly good NFS/local-artifact binding). Keys map to paths under
  * `root`; empty files are invisible to `list`, matching the
  * reference's `Size > 0` filter (`packagers/common.py:70-71`).
  */
class LocalFsObjectStore(root: String) extends ObjectStore {
  private def p(key: String): Path = Paths.get(root, key)

  override def exists(key: String): Boolean = Files.isRegularFile(p(key))

  override def put(localFile: Path, key: String): String = {
    val target = p(key)
    Files.createDirectories(target.getParent)
    Files.copy(localFile, target, StandardCopyOption.REPLACE_EXISTING)
    url(key)
  }

  override def get(key: String, localFile: Path): Boolean =
    if (!exists(key)) false
    else {
      Option(localFile.getParent).foreach(Files.createDirectories(_))
      Files.copy(p(key), localFile, StandardCopyOption.REPLACE_EXISTING)
      true
    }

  override def list(prefix: String): Seq[String] = {
    // walk only the deepest directory the prefix implies — O(matching
    // subtree) like the reference's server-side prefix scan
    // (`packagers/common.py:66-72`), not O(entire store); a ledger
    // listing one day's keys must not pay for the whole history
    val rootPath = Paths.get(root)
    val slash = prefix.lastIndexOf('/')
    val startPath =
      if (slash < 0) rootPath else rootPath.resolve(prefix.substring(0, slash))
    if (!Files.isDirectory(startPath)) Seq.empty
    else {
      val stream = Files.walk(startPath)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => rootPath.relativize(f).toString.replace(File.separatorChar, '/'))
          .filter(k => k.startsWith(prefix) && Files.size(p(k)) > 0)
          .toSeq.sorted
      } finally stream.close()
    }
  }

  override def lastModified(key: String): Option[Long] =
    if (exists(key)) Some(Files.getLastModifiedTime(p(key)).toMillis) else None

  override def url(key: String): String = s"file://$root/$key"
}

/** Hadoop-FileSystem-rooted [[ObjectStore]] — the deployment binding.
  * `baseUri` selects the backend by scheme: `s3a://bucket/prefix`
  * (with hadoop-aws on the deployment classpath), `gs://`, `abfs://`,
  * `hdfs://`, or `file:///` — the five operations ride whatever
  * FileSystem implementation the classpath provides, credentials and
  * endpoint come from the Hadoop configuration (e.g.
  * `fs.s3a.endpoint` for the reference's S3-compatible provider,
  * `packagers/common.py:14-23`'s client construction), and THIS code
  * never changes. The sandbox has no cloud connector jars (zero
  * egress), so SourcesSpec exercises the binding over `file:` and pins
  * parity with [[LocalFsObjectStore]] operation by operation — the
  * scheme swap is config, not code.
  */
class HadoopFsObjectStore(baseUri: String,
                          conf: org.apache.hadoop.conf.Configuration)
    extends ObjectStore {
  import org.apache.hadoop.fs.{Path => HPath}

  private val base = new HPath(
    if (baseUri.endsWith("/")) baseUri.dropRight(1) else baseUri)
  private val fs = base.getFileSystem(conf)
  private def hp(key: String): HPath = new HPath(base, key)

  private def fileStatus(key: String) =
    try Some(fs.getFileStatus(hp(key))).filter(_.isFile)
    catch { case _: java.io.FileNotFoundException => None }

  override def exists(key: String): Boolean = fileStatus(key).isDefined

  override def put(localFile: Path, key: String): String = {
    // delSrc=false, overwrite=true — republishing a key replaces it,
    // matching LocalFsObjectStore's REPLACE_EXISTING copy
    fs.copyFromLocalFile(false, true,
      new HPath(localFile.toUri), hp(key))
    url(key)
  }

  override def get(key: String, localFile: Path): Boolean =
    if (!exists(key)) false
    else {
      Option(localFile.getParent).foreach(Files.createDirectories(_))
      // useRawLocalFileSystem=true: no .crc sidecar beside the download
      fs.copyToLocalFile(false, hp(key), new HPath(localFile.toUri), true)
      true
    }

  override def list(prefix: String): Seq[String] = {
    // scope the recursive listing to the deepest prefix directory —
    // on s3a each listFiles page is a server-side prefix scan, so this
    // is the LIST call shape the reference uses
    // (`packagers/common.py:66-72`), O(matching keys) not O(bucket)
    // slash <= 0 covers both no-slash prefixes and a (malformed but
    // tolerated) leading-slash prefix like "/key", whose dir part is
    // the empty string — `new HPath(base, "")` would throw where the
    // LocalFs binding quietly resolves to the root
    val slash = prefix.lastIndexOf('/')
    val start =
      if (slash <= 0) base else new HPath(base, prefix.substring(0, slash))
    if (!fs.exists(start)) Seq.empty
    else {
      val it = fs.listFiles(start, true)
      val keys = scala.collection.mutable.ArrayBuffer.empty[String]
      val baseStr = base.toUri.getPath
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(baseStr)
          .stripPrefix("/")
        if (rel.startsWith(prefix) && st.getLen > 0) keys += rel
      }
      keys.toSeq.sorted
    }
  }

  override def lastModified(key: String): Option[Long] =
    fileStatus(key).map(_.getModificationTime)

  override def url(key: String): String = s"$base/$key"
}

object ObjectStore {

  /** Recursive local-filesystem delete — THE one copy for `java.io.File`
    * paths (staging dirs, lake table swaps, retention sweeps, orphaned
    * warehouse dirs all use it). Missing paths are a no-op. The one
    * deliberate sibling is `Materialize.deleteRecursively`, which goes
    * through the Hadoop FS API because checkpoint dirs can be
    * `hdfs://`/object-store URIs and shutdown swallows failures.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** The reference's collision-avoiding key probe
    * (`artifacts/common.py:50-64`, `siri/storage_backup_cleanup.py:
    * 20-36`): try the plain key, then `__2`, `__3`, … up to `attempts`,
    * returning the first key not already present — re-publishing never
    * overwrites history.
    */
  def freeKey(store: ObjectStore, plain: String, withSuffix: Int => String,
              attempts: Int = 30): String =
    (0 until attempts).iterator
      .map(i => if (i == 0) plain else withSuffix(i + 1))
      .find(!store.exists(_))
      .getOrElse(sys.error(s"failed to find available target path for $plain"))

  /** Zip a directory recursively with root-relative entry names — the
    * reference's `compress_directory` (`artifacts/common.py:17-29`, a
    * recursive glob zipped under `os.path.relpath` names). Returns the
    * zip path; the caller supplies the target location.
    */
  def zipDirectory(sourceDir: Path, zipFile: Path): Path = {
    val out = new ZipOutputStream(Files.newOutputStream(zipFile))
    val stream = Files.walk(sourceDir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .toSeq.sortBy(_.toString)
        .foreach { f =>
          out.putNextEntry(new ZipEntry(
            sourceDir.relativize(f).toString.replace(File.separatorChar, '/')))
          out.write(Files.readAllBytes(f))
          out.closeEntry()
        }
    } finally { stream.close(); out.close() }
    zipFile
  }
}
