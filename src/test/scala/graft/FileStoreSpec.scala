package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileStore

/** Golden behavior of the versioned file store against the reference's
  * check-in/check-out contract (`FileManager/FileCollection.cs:107-767`):
  * add/check-in versioning, version-pinned checkout, cross-user conflict
  * rules, abandon, delete, rename, and distributed directory ingest via
  * the binaryFile source.
  */
class FileStoreSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def newStore() = new FileStore(spark,
    java.nio.file.Files.createTempDirectory("graft_files").toString)

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("add + check-in create sequential versions; checkout returns the " +
      "requested version's bytes") {
    val fs = newStore()
    val id = fs.addNewFile("ana", "report.txt", bytes("v1 content"))
    assert(fs.metadata(id).exists(_.getAs[Int]("current_version") == 1))
    fs.checkIn("ana", id, bytes("v2 content"))
    fs.checkIn("ana", id, bytes("v3 content"))
    assert(fs.metadata(id).exists(_.getAs[Int]("current_version") == 3))
    // default checkout = current version
    val (meta, cur) = fs.checkOut("ana", id)
    assert(new String(cur, "UTF-8") == "v3 content")
    assert(meta.getAs[String]("file_name") == "report.txt")
    assert(meta.getAs[String]("file_ext") == "txt")
    fs.abandonCheckout("ana", id)
    // version-pinned checkout
    val (_, v1) = fs.checkOut("ana", id, Some(1))
    assert(new String(v1, "UTF-8") == "v1 content")
    fs.abandonCheckout("ana", id)
    // version <= 0 is the "no specific version" sentinel -> current
    val (_, v0) = fs.checkOut("ana", id, Some(0))
    assert(new String(v0, "UTF-8") == "v3 content")
    fs.abandonCheckout("ana", id)
    // version history carries hashes and sizes
    val hist = fs.fileVersions(id).collect()
      .map(r => r.getAs[Int]("version") -> r.getAs[Long]("n_bytes")).toMap
    assert(hist == Map(1 -> 10L, 2 -> 10L, 3 -> 10L))
  }

  test("cross-user rules: checkout blocks other users until check-in or " +
      "abandon; version mismatch by owner errors") {
    val fs = newStore()
    val id = fs.addNewFile("ana", "doc.md", bytes("base"))
    fs.checkOut("ana", id)
    // another user cannot check out, check in, or delete
    intercept[IllegalStateException](fs.checkOut("bob", id))
    intercept[IllegalStateException](fs.checkIn("bob", id, bytes("x")))
    intercept[IllegalStateException](fs.deleteFile("bob", id))
    // the owner at a different pinned version errors (reference behavior)
    intercept[IllegalStateException](fs.checkOut("ana", id, Some(99)))
    // owner check-in closes the checkout; bob can now check out
    fs.checkIn("ana", id, bytes("v2"))
    val (_, content) = fs.checkOut("bob", id)
    assert(new String(content, "UTF-8") == "v2")
    // abandon by another user needs force
    intercept[IllegalStateException](fs.abandonCheckout("ana", id))
    fs.abandonCheckout("ana", id, force = true)
    assert(fs.activeCheckout(id).isEmpty)
  }

  test("new-file id collision, missing file, and missing version error " +
      "loudly; delete tombstones metadata but keeps blobs") {
    val fs = newStore()
    val id = fs.addNewFile("ana", "a.bin", bytes("a"))
    intercept[IllegalArgumentException](fs.checkIn("ana", "nosuch", bytes("x")))
    intercept[IllegalArgumentException](fs.checkOut("ana", "nosuch"))
    intercept[IllegalArgumentException](fs.checkOut("ana", id, Some(9)))
    fs.deleteFile("ana", id)
    assert(fs.metadata(id).isEmpty)
    fs.deleteFile("ana", id) // idempotent no-op
    // append-only blob table keeps the version rows (tombstone delete)
    assert(fs.fileVersions(id).count() == 1)
  }

  test("rename updates metadata and the event log records the operation " +
      "trail (access-log analog)") {
    val fs = newStore()
    val id = fs.addNewFile("ana", "old.csv", bytes("z"))
    fs.renameFile("ana", id, "new.parquet")
    val m = fs.metadata(id).get
    assert(m.getAs[String]("file_name") == "new.parquet")
    assert(m.getAs[String]("file_ext") == "parquet")
    val ops = fs.events.filter(org.apache.spark.sql.functions.col("file_id") === id)
      .orderBy("seq").collect().map(_.getAs[String]("op")).toSeq
    assert(ops == Seq("new", "rename"))
  }

  test("ingestDirectory bulk-loads files through the binaryFile source") {
    val fs = newStore()
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest")
    java.nio.file.Files.write(dir.resolve("one.txt"), bytes("first file"))
    java.nio.file.Files.write(dir.resolve("two.txt"), bytes("second file"))
    val ids = fs.ingestDirectory("ana", dir.toString)
    assert(ids.size == 2)
    val byName = fs.files.collect()
      .map(r => r.getAs[String]("file_name") -> r.getAs[String]("file_id")).toMap
    assert(byName.keySet == Set("one.txt", "two.txt"))
    val (_, content) = fs.checkOut("ana", byName("one.txt"))
    assert(new String(content, "UTF-8") == "first file")
    // sha256 recorded per version
    val sha = fs.fileVersions(byName("two.txt")).collect().head
      .getAs[String]("sha256")
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes("second file")).map("%02x".format(_)).mkString
    assert(sha == want)
  }

  test("GraftDatabase exposes the store under Files/") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dbfiles").toString
    val db = graft.catalog.GraftDatabase(spark, "fsdb", dir)
    val id = db.fileStore.addNewFile("ana", "x.txt", bytes("via db"))
    assert(new String(db.fileStore.checkOut("ana", id)._2, "UTF-8") == "via db")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "fsdb", "Files", "versions")))
  }
}
