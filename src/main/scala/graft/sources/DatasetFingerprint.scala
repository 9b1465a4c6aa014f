package graft.sources

import org.apache.spark.sql.SparkSession

/** Cheap driver-side content fingerprint of a dataset path: md5 over
  * the recursive (relative path, length, mtime) listing, resolved
  * through the Hadoop FileSystem API so the same call works on `file:`,
  * `hdfs:` and object-store schemes. One FS listing per call — O(files)
  * metadata RPCs, no data read — which is what makes it cheap enough to
  * fold into every derived-state cache key ([[graft.queries.QueryMemo]]
  * entries, the IVF index home): a dataset rewritten IN PLACE changes
  * its fingerprint, so stale signatures / cluster labels / indexes are
  * never served and no caller has to remember a manual invalidate.
  *
  * Mirrors the reference's freshness contract — its task ledger decides
  * staleness from upstream file metadata, not file contents
  * (`open_bus_stride_etl/common.py`'s download-if-newer helpers).
  *
  * KNOWN LIMIT: the contract holds only when a rewrite changes some
  * (name, length, mtime) triple. Spark-written tables always do (fresh
  * random part-file names per job), but an external tool that rewrites
  * files in place preserving names AND sizes within one mtime tick
  * (rsync --times, a same-second same-size overwrite on a
  * seconds-granularity filesystem) fingerprints identically and stale
  * derived state would be served. If such writers share the lake, fold
  * a content discriminator (e.g. parquet footer checksum) into the
  * entry line — metadata-only is the deliberate cheap default, same
  * trade the reference makes.
  */
object DatasetFingerprint {

  /** Fingerprint of everything under `path` (a file or a directory).
    * A missing path fingerprints as the empty listing — callers decide
    * whether that is an error.
    */
  def of(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        entries += s"${f.getPath.toUri.getPath}|${f.getLen}|${f.getModificationTime}"
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Fingerprint of one table's file(s) inside a dataset dir — the
    * granularity the memoized derivations key on (a rewritten
    * `documents` table must not invalidate an `embeddings` index).
    */
  def ofTable(s: SparkSession, dir: String, table: String): String =
    of(s, s"$dir/$table.parquet")
}
