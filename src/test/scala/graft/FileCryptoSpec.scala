package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.GraftDatabase
import graft.core.{Collation, FileCrypto}

/** Transparent file-at-rest encryption (`core.FileCrypto`): the
  * reference's whole-datafile AES stream (`AesStream.cs:50-110`) and
  * `RebuildOptions.Password` re-encryption, re-expressed as Parquet
  * Modular Encryption carried through every store's read/write options.
  */
class FileCryptoSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def fresh(password: Option[String]): (GraftDatabase, String) = {
    val base = Files.createTempDirectory("graft-crypto").toString
    (GraftDatabase(spark, "vault", base, Collation.Binary, password), base)
  }

  test("an encrypted database round-trips through the facade, but its " +
      "raw files are unreadable and carry the encrypted-footer magic") {
    val (db, _) = fresh(Some("s3cret"))
    db.insert("customer", Seq((1, "ann"), (2, "bob")).toDF("id", "name"))
    db.insert("customer", Seq((3, "cal")).toDF("id", "name"))
    assert(db.table("customer").count() == 3)
    assert(db.query("customer").where(
      org.apache.spark.sql.functions.col("name") === "ann").toDf.count() == 1)

    val files = db.liveFiles("customer")
    assert(files.nonEmpty)
    files.foreach(f => assert(FileCrypto.isEncryptedFile(f),
      s"data file not encrypted: $f"))
    // without the key material options, the file is opaque
    val ex = intercept[Exception](spark.read.parquet(files.head).collect())
    assert(ex.getMessage != null)
  }

  test("DML (update/delete/upsert) works unchanged under encryption") {
    val (db, _) = fresh(Some("s3cret"))
    db.insert("customer", Seq((1, "ann", 30), (2, "bob", 40))
      .toDF("id", "name", "age"))
    db.updateMany("customer", org.apache.spark.sql.functions.col("id") === 1,
      Map("age" -> org.apache.spark.sql.functions.lit(31)))
    db.delete("customer", org.apache.spark.sql.functions.col("id") === 2)
    assert(db.table("customer").select("age").as[Int].collect().toSeq == Seq(31))
    db.liveFiles("customer").foreach(f => assert(FileCrypto.isEncryptedFile(f)))
  }

  test("password mismatches fail loudly at open, like the reference's " +
      "encryption-indicator check (AesStream.cs:71-77)") {
    val (db, base) = fresh(Some("s3cret"))
    db.insert("customer", Seq((1, "ann")).toDF("id", "name"))
    // encrypted store, no password → loud, at open
    val e1 = intercept[IllegalStateException](
      GraftDatabase(spark, "vault", base))
    assert(e1.getMessage.contains("encrypted"))
    // plaintext store, password → loud, at open
    val (plain, plainBase) = fresh(None)
    plain.insert("t", Seq(1).toDF("id"))
    val e2 = intercept[IllegalStateException](
      GraftDatabase(spark, "vault", plainBase, Collation.Binary, Some("x")))
    assert(e2.getMessage.contains("not encrypted"))
    // the RIGHT password re-opens and reads
    val again = GraftDatabase(spark, "vault", base, Collation.Binary,
      Some("s3cret"))
    assert(again.table("customer").count() == 1)
    // a WRONG password passes the probe (file IS encrypted) but the key
    // unwrap fails authentication at read
    val wrong = GraftDatabase(spark, "vault", base, Collation.Binary,
      Some("nope"))
    intercept[Exception](wrong.table("customer").collect())
  }

  test("rebuild(password) encrypts a plaintext database in place and " +
      "deletes the plaintext files; rebuild(None) decrypts back") {
    val (plain, _) = fresh(None)
    plain.insert("customer", Seq((1, "ann"), (2, "bob")).toDF("id", "name"))
    plain.insert("orders", Seq((10, 1)).toDF("id", "customer_id"))
    assert(plain.liveFiles("customer").forall(!FileCrypto.isEncryptedFile(_)))

    val enc = plain.rebuild(password = Some("s3cret"))
    assert(enc.table("customer").count() == 2)
    assert(enc.table("orders").count() == 1)
    (enc.liveFiles("customer") ++ enc.liveFiles("orders"))
      .foreach(f => assert(FileCrypto.isEncryptedFile(f),
        s"rebuild left plaintext file: $f"))
    // the shrink vacuumed the old plaintext versions — nothing readable
    // without the password remains in the table store
    val tablesDir = java.nio.file.Paths.get(enc.root, "Tables")
    val walk = java.nio.file.Files.walk(tablesDir)
    val leftovers = try {
      val it = walk.iterator()
      var acc = List.empty[String]
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet") &&
            !FileCrypto.isEncryptedFile(p.toString)) acc ::= p.toString
      }
      acc
    } finally walk.close()
    assert(leftovers.isEmpty, s"plaintext leftovers: $leftovers")

    // reference-faithful: rebuild with NO password decrypts
    val back = enc.rebuild()
    assert(back.table("customer").count() == 2)
    assert(back.liveFiles("customer").forall(!FileCrypto.isEncryptedFile(_)))
  }

  test("rebuild(password) flips the TimeSeries and Files stores too, and " +
      "the retired pre-rebuild facade is fenced from writing") {
    val (plain, _) = fresh(None)
    plain.insert("customer", Seq((1, "ann")).toDF("id", "name"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    plain.tsAppend(Seq(("g1", t0, 1.0)).toDF("point_guid", "ts", "value"))
    plain.fileStore.addNewFile("ann", "a.txt", "hi".getBytes("UTF-8"))

    val enc = plain.rebuild(password = Some("s3cret"))
    // EVERY parquet under the root is now encrypted — tables, TS, files
    def states(root: String): Set[Boolean] = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val it = walk.iterator()
        var acc = Set.empty[Boolean]
        while (it.hasNext) {
          val p = it.next()
          if (p.toString.endsWith(".parquet"))
            acc += FileCrypto.isEncryptedFile(p.toString)
        }
        acc
      } finally walk.close()
    }
    assert(states(enc.root) == Set(true),
      "rebuild must re-encrypt TimeSeries/ and Files/, not just Tables/")
    // and they stay readable through the new facade
    assert(enc.tsRange("g1", t0, t0).count() == 1)
    assert(enc.fileStore.files.count() == 1)

    // the OLD facade must not write plaintext into the encrypted store
    intercept[IllegalStateException](
      plain.insert("customer", Seq((2, "bob")).toDF("id", "name")))
    intercept[IllegalStateException](
      plain.tsAppend(Seq(("g1", t0, 2.0)).toDF("point_guid", "ts", "value")))
    intercept[IllegalStateException](
      plain.fileStore.addNewFile("ann", "b.txt", "x".getBytes("UTF-8")))
    intercept[IllegalStateException](plain.dropCollection("customer"))

    // decrypting back flips all three stores to plaintext
    val back = enc.rebuild()
    assert(states(back.root) == Set(false))
    assert(back.tsRange("g1", t0, t0).count() == 1)
  }

  test("a database holding only time-series data still fails loudly when " +
      "reopened without its password") {
    val (db, base) = fresh(Some("s3cret"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    db.tsAppend(Seq(("g1", t0, 1.0)).toDF("point_guid", "ts", "value"))
    val e = intercept[IllegalStateException](GraftDatabase(spark, "vault", base))
    assert(e.getMessage.contains("encrypted"))
  }

  test("each database gets its own random salt, so a shared passphrase " +
      "does not mean a shared master key (AesStream.cs stored salt)") {
    val (db1, base1) = fresh(Some("same-pass"))
    val (db2, base2) = fresh(Some("same-pass"))
    db1.insert("t", Seq(1).toDF("id"))
    db2.insert("t", Seq(2).toDF("id"))
    val s1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base1, "vault", "_crypto.salt"))
    val s2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base2, "vault", "_crypto.salt"))
    assert(!java.util.Arrays.equals(s1, s2), "salts must be random per db")
    // both still round-trip under their own salt
    assert(db1.table("t").count() == 1 && db2.table("t").count() == 1)
    // and the salt persists: reopening reads the stored one
    val again = GraftDatabase(spark, "vault", base1,
      graft.core.Collation.Binary, Some("same-pass"))
    assert(again.table("t").count() == 1)
  }

  test("file-granular DML composes with encryption: kept files stay, " +
      "the staged replacement is encrypted, contents are exact") {
    val (db, _) = fresh(Some("s3cret"))
    (0 until 3).foreach { b =>
      db.insert("customer", (1 to 5).map(i => (b * 10 + i, s"n${b * 10 + i}"))
        .toDF("id", "name").coalesce(1))
    }
    val before = db.liveFiles("customer")
    assert(before.size == 3)
    db.updateMany("customer",
      org.apache.spark.sql.functions.col("id").between(11, 15),
      Map("name" -> org.apache.spark.sql.functions.lit("x")))
    val after = db.liveFiles("customer")
    assert(before.toSet.intersect(after.toSet).size == 2,
      "granular rewrite must keep the two untouched encrypted files")
    after.foreach(f => assert(FileCrypto.isEncryptedFile(f),
      s"staged replacement must be encrypted: $f"))
    assert(db.table("customer")
      .filter(org.apache.spark.sql.functions.col("name") === "x")
      .count() == 5)
    assert(db.count("customer") == 15)
  }

  test("the time-series and file stores encrypt under the same password") {
    val (db, _) = fresh(Some("s3cret"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
    db.tsAppend(Seq(("g1", t0, 1.0), ("g1", t1, 2.0))
      .toDF("point_guid", "ts", "value"))
    assert(db.tsRange("g1", t0, t1).count() == 2)

    db.fileStore.addNewFile("ann", "readme.txt", "hello".getBytes("UTF-8"))
    assert(db.fileStore.files.count() == 1)

    // every parquet file under the database root is encrypted
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(db.root))
    try {
      val it = walk.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet"))
          assert(FileCrypto.isEncryptedFile(p.toString),
            s"unencrypted store file: $p")
      }
    } finally walk.close()
  }
}
