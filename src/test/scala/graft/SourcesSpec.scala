package graft

import java.nio.file.Files
import java.sql.Date

import graft.sources.{ArtifactUploader, CsvPackage, LocalFsObjectStore, TaskLedger}

/** A second URI scheme for the object-store parity gate: `mock://`
  * resolves through `fs.mock.impl` to this local-backed FileSystem, so
  * `HadoopFsObjectStore` exercises its real dispatch path (conf-driven
  * `Path.getFileSystem`, non-`file:` base URI) without any cloud
  * connector jar — exactly how a deployment would wire `s3a://`:
  * configuration only, zero code changes. Needs the public no-arg
  * constructor Hadoop's reflection instantiation requires.
  */
class MockSchemeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path => HPath}

  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")

  // RawLocal's DeprecatedRawLocalFileStatus loads permissions LAZILY via
  // `new java.io.File(path.toUri)`, which rejects any non-"file" scheme —
  // materialize plain FileStatus copies (permission pre-resolved to the
  // default) so listFiles/getFileStatus never touch that path
  private def plain(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, st.getPath)

  override def getFileStatus(f: HPath): FileStatus =
    plain(super.getFileStatus(f))

  override def listStatus(f: HPath): Array[FileStatus] =
    super.listStatus(f).map(plain)
}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("CsvPackage writes one csv + metadata, skips unchanged, zips") {
    val dir = Files.createTempDirectory("graft_pkg").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r1 = CsvPackage.write(df, dir, "2024-01-01.10")
    assert(!r1.skipped && r1.rows == 2)
    assert(new java.io.File(r1.csvPath).exists())
    val meta = Files.readString(java.nio.file.Paths.get(r1.metadataPath))
    assert(meta.contains(s""""hash":"sha256:${r1.sha256}""""))
    assert(meta.contains(""""name":"id","type":"bigint""""))

    // identical content → skip (T8); changed content → new hash
    val r2 = CsvPackage.write(df, dir, "2024-01-01.10", Some(r1.sha256))
    assert(r2.skipped && r2.sha256 == r1.sha256)
    val r3 = CsvPackage.write(Seq((3L, "c")).toDF("id", "name"),
      dir, "2024-01-01.10", Some(r1.sha256))
    assert(!r3.skipped && r3.sha256 != r1.sha256)

    val zipPath = CsvPackage.zip(dir, "2024-01-01.10")
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = zf.entries().asIterator()
      val names = Iterator.continually(entries)
        .takeWhile(_.hasNext).map(_.next().getName).toSet
      assert(names == Set("2024-01-01.10.csv", "2024-01-01.10.datapackage.json"))
    } finally zf.close()
  }

  test("readAllStrings round-trips every column as nullable string") {
    val dir = Files.createTempDirectory("graft_csv").toString
    CsvPackage.write(Seq((1L, "x"), (2L, "")).toDF("id", "v"), dir, "legacy")
    val back = CsvPackage.readAllStrings(spark, s"$dir/legacy.csv", Seq("id", "v"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() == 2)
    assert(back.select($"id").as[String].collect().toSet == Set("1", "2"))
  }

  test("TaskLedger: anti-join missing dates, failed retry, catch-up loop") {
    val path = Files.createTempDirectory("graft_ledger").toString + "/ledger"
    val candidates = Seq(
      Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02"),
      Date.valueOf("2024-01-03")).toDF("date")

    // nothing recorded → all dates missing, newest first (O7)
    val m0 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect().toSeq
    assert(m0 == Seq(Date.valueOf("2024-01-03"), Date.valueOf("2024-01-02"),
      Date.valueOf("2024-01-01")))

    // catch-up processes every date once; 01-02 fails and stays missing
    val processed = TaskLedger.catchUp(spark, path, candidates, "agg") {
      d => d != Date.valueOf("2024-01-02")
    }
    assert(processed.toSet == Set(Date.valueOf("2024-01-01"),
      Date.valueOf("2024-01-02"), Date.valueOf("2024-01-03")))
    val m1 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect().toSeq
    assert(m1 == Seq(Date.valueOf("2024-01-02"))) // failed → retry next run

    // a later successful attempt wins over the old failure
    TaskLedger.record(spark, path, Date.valueOf("2024-01-02"), "agg", success = true)
    val m2 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect()
    assert(m2.isEmpty)

    // other tasks are unaffected (task_name is part of the key)
    val mOther = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "other")
      .as[Date].collect()
    assert(mOther.length == 3)
  }

  test("object store: put/exists/get/list/lastModified round-trip") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new LocalFsObjectStore(root)
    val src = Files.createTempFile("graft_src", ".txt")
    Files.writeString(src, "payload")
    assert(!store.exists("a/b.txt"))
    assert(store.lastModified("a/b.txt").isEmpty)
    val url = store.put(src, "a/b.txt")
    assert(url == s"file://$root/a/b.txt")
    assert(store.exists("a/b.txt") && store.lastModified("a/b.txt").nonEmpty)
    val dst = Files.createTempFile("graft_dst", ".txt")
    assert(store.get("a/b.txt", dst))
    assert(Files.readString(dst) == "payload")
    assert(!store.get("a/missing.txt", dst))
    store.put(src, "a/c.txt")
    store.put(src, "z/d.txt")
    assert(store.list("a/") == Seq("a/b.txt", "a/c.txt"))
  }

  /** The shared five-operation scenario both parity tests replay —
    * its result is deliberately scheme-free (no URLs), so any two
    * [[graft.sources.ObjectStore]] bindings can be compared.
    */
  private def storeScenario(store: graft.sources.ObjectStore): Seq[Any] = {
    import graft.sources.ObjectStore
      val src = Files.createTempFile("graft_hsrc", ".txt")
      Files.writeString(src, "payload")
      val empty = Files.createTempFile("graft_hempty", ".txt")
      val before =
        Seq(store.exists("a/b.txt"), store.lastModified("a/b.txt").isEmpty,
          store.get("a/missing.txt", Files.createTempFile("graft_hdst", ".x")))
      store.put(src, "a/b.txt")
      store.put(src, "a/c.txt")
      store.put(src, "z/d.txt")
      store.put(empty, "a/empty.txt") // size-0: invisible to list
      store.put(src, "a/b.txt") // republish replaces, never duplicates
      val dst = Files.createTempFile("graft_hdst", ".txt")
      val got = store.get("a/b.txt", dst)
      val free = ObjectStore.freeKey(store, "a/b.txt", n => s"a/b__$n.txt")
      before ++ Seq(store.exists("a/b.txt"),
        store.lastModified("a/b.txt").nonEmpty, got,
        Files.readString(dst), store.list("a/"),
        // prefix-scoped listing edge cases must agree between bindings:
        // nested dir prefix, no-slash prefix, missing dir, and the
        // malformed leading-slash prefix (tolerated as empty, no throw)
        store.list("a/b"), store.list("z"), store.list("nope/x"),
        store.list("/a"),
        free) // kept last: the caller asserts on it positionally
  }

  test("HadoopFsObjectStore matches LocalFsObjectStore operation by " +
    "operation over file: (the deployment binding's parity gate)") {
    import graft.sources.HadoopFsObjectStore
    val localRoot = Files.createTempDirectory("graft_store_l").toString
    val hadoopRoot = Files.createTempDirectory("graft_store_h").toString
    val local = storeScenario(new LocalFsObjectStore(localRoot))
    val hadoop = storeScenario(new HadoopFsObjectStore(s"file://$hadoopRoot",
      spark.sparkContext.hadoopConfiguration))
    assert(hadoop == local, s"bindings diverge:\n$hadoop\nvs\n$local")
    assert(hadoop.last == "a/b__2.txt")
    // url carries the base URI — the scheme a deployment configures
    // (Hadoop Path normalizes file:///x to file:/x)
    assert(new HadoopFsObjectStore(s"file://$hadoopRoot",
      spark.sparkContext.hadoopConfiguration).url("k.txt")
      == s"file:$hadoopRoot/k.txt")
  }

  test("HadoopFsObjectStore over a SECOND scheme (mock://, wired purely " +
    "through fs.mock.impl config) matches the local binding — the " +
    "scheme swap is config, not code") {
    import graft.sources.HadoopFsObjectStore
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.mock.impl", classOf[MockSchemeFileSystem].getName)
    conf.setBoolean("fs.mock.impl.disable.cache", true)
    val localRoot = Files.createTempDirectory("graft_store_l2").toString
    val mockRoot = Files.createTempDirectory("graft_store_m").toString
    val store = new HadoopFsObjectStore(s"mock://$mockRoot", conf)
    // the binding really dispatched on the configured scheme
    assert(store.url("k.txt").startsWith("mock:"))
    val mock = storeScenario(store)
    val local = storeScenario(new LocalFsObjectStore(localRoot))
    assert(mock == local, s"bindings diverge:\n$mock\nvs\n$local")
    // and the objects physically landed under the mock root
    assert(Files.isRegularFile(java.nio.file.Paths.get(mockRoot, "a/b.txt")))
  }

  test("artifact upload: collision-avoiding __N keys and success rows") {
    val base = Files.createTempDirectory("graft_art").toString
    val store = new LocalFsObjectStore(s"$base/store")
    val ledger = s"$base/ledger"
    val f = Files.createTempFile("graft_artifact", ".csv")
    Files.writeString(f, "x,y\n1,2\n")
    // same prefix three times → plain, __2, __3 (never overwrites)
    val r1 = ArtifactUploader.upload(spark, ledger, store, f, "pkg/2024-01-01", ".csv")
    val r2 = ArtifactUploader.upload(spark, ledger, store, f, "pkg/2024-01-01", ".csv")
    val r3 = ArtifactUploader.upload(spark, ledger, store, f, "pkg/2024-01-01", ".csv")
    assert(r1.key == "artifacts/pkg/2024-01-01.csv")
    assert(r2.key == "artifacts/pkg/2024-01-01__2.csv")
    assert(r3.key == "artifacts/pkg/2024-01-01__3.csv")
    assert(Seq(r1, r2, r3).map(_.artifactId).distinct.size == 3)
    val st = ArtifactUploader.load(spark, ledger)
      .select($"artifact_id", $"status").as[(Long, String)].collect().toMap
    assert(Seq(r1, r2, r3).forall(r => st(r.artifactId) == "success"))
  }

  test("artifact upload: failure transitions the row to error and rethrows") {
    val base = Files.createTempDirectory("graft_artf").toString
    val ledger = s"$base/ledger"
    val boom = new LocalFsObjectStore(s"$base/store") {
      override def put(localFile: java.nio.file.Path, key: String): String =
        sys.error("upload exploded")
    }
    val f = Files.createTempFile("graft_artifact", ".csv")
    Files.writeString(f, "x\n")
    intercept[RuntimeException] {
      ArtifactUploader.upload(spark, ledger, boom, f, "pkg/boom", ".csv")
    }
    val rows = ArtifactUploader.load(spark, ledger)
      .select($"status", $"error").as[(String, String)].collect()
    assert(rows.length == 1)
    assert(rows.head._1 == "error" && rows.head._2.contains("upload exploded"))
    // failed uploads never surface from iterate_artifacts
    assert(ArtifactUploader.iterateArtifacts(spark, ledger, "pkg/").count() == 0)
  }

  test("artifact upload: directories are zipped with relative entry names") {
    val base = Files.createTempDirectory("graft_artd").toString
    val store = new LocalFsObjectStore(s"$base/store")
    val ledger = s"$base/ledger"
    val dir = Files.createTempDirectory("graft_payload")
    Files.writeString(dir.resolve("one.txt"), "1")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("sub/two.txt"), "2")
    val r = ArtifactUploader.upload(spark, ledger, store, dir, "dumps/d1", "",
      isDirectory = true)
    assert(r.key == "artifacts/dumps/d1.zip")
    val local = Files.createTempFile("graft_dl", ".zip")
    assert(store.get(r.key, local))
    val zf = new java.util.zip.ZipFile(local.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names == Set("one.txt", "sub/two.txt"))
    } finally zf.close()
  }

  test("iterate_artifacts: success-only, prefix-filtered, newest first, limited") {
    val base = Files.createTempDirectory("graft_arti").toString
    val store = new LocalFsObjectStore(s"$base/store")
    val ledger = s"$base/ledger"
    val f = Files.createTempFile("graft_artifact", ".txt")
    Files.writeString(f, "v")
    val a = ArtifactUploader.upload(spark, ledger, store, f, "reports/a", ".txt")
    val b = ArtifactUploader.upload(spark, ledger, store, f, "reports/b", ".txt")
    ArtifactUploader.upload(spark, ledger, store, f, "other/c", ".txt")
    val all = ArtifactUploader.iterateArtifacts(spark, ledger, "reports/")
      .select($"artifact_id").as[Long].collect().toSeq
    assert(all.toSet == Set(a.artifactId, b.artifactId))
    assert(all.head == b.artifactId) // newest first
    val limited = ArtifactUploader.iterateArtifacts(spark, ledger, "reports/",
      limit = Some(1)).select($"artifact_id").as[Long].collect().toSeq
    assert(limited == Seq(b.artifactId))
  }

  test("JsonLines round-trips, quarantines corrupt lines, honors gzip") {
    import graft.sources.JsonLines
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft_jsonl").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    // write a clean frame, read it back schema-enforced
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    JsonLines.write(df, s"$base/clean", numFiles = 1)
    val back = JsonLines.readClean(spark, s"$base/clean", schema)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "alpha"), (2L, "beta")))

    // hand-write a file with one broken line: clean rows survive, the
    // broken line is quarantined verbatim, nothing is silently dropped
    val dirty = s"$base/dirty"
    new java.io.File(dirty).mkdirs()
    Files.writeString(java.nio.file.Path.of(dirty, "part-0.jsonl"),
      """{"doc_id": 1, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    assert(JsonLines.readClean(spark, dirty, schema)
      .as[(Long, String)].collect().toSet == Set((1L, "ok"), (2L, "also ok")))
    val corrupt = JsonLines.corruptLines(spark, dirty, schema)
      .as[String].collect().toSeq
    assert(corrupt == Seq("{not json at all"))

    // gzip write round-trips (one .gz part per output file)
    JsonLines.write(df, s"$base/gz", numFiles = 1, gzipped = true)
    assert(new java.io.File(s"$base/gz").listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    assert(JsonLines.readClean(spark, s"$base/gz", schema).count() == 2)
  }
}
