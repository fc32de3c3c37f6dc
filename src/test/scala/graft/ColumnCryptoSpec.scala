package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.ColumnCrypto

/** The AesStream.cs password contract mapped to columns: round-trips,
  * determinism trade-off, wrong-key behavior.
  */
class ColumnCryptoSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val pw = "hunter2"
  private def docs = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "")).toDF("id", "t")

  test("GCM and ECB both round-trip, including the empty string") {
    for (det <- Seq(true, false)) {
      val rt = docs.select(col("t"), ColumnCrypto.decrypt(
        ColumnCrypto.encrypt(col("t"), pw, det), pw, det).as("rt"))
      assert(rt.filter(col("t") =!= col("rt")).count() == 0, s"det=$det")
    }
  }

  test("ECB is deterministic (equal plaintexts collide), GCM is not") {
    // docs carries "alpha" twice: deterministic ECB must collide those
    // two rows (3 distinct ciphertexts for 4 rows); GCM's random IV must
    // keep all 4 distinct. (Comparing two aes_encrypt calls in ONE row
    // would be defeated by common-subexpression elimination.)
    val ct = docs.select(
      ColumnCrypto.encrypt(col("t"), pw, deterministic = true).as("ecb"),
      ColumnCrypto.encrypt(col("t"), pw).as("gcm"))
    assert(ct.agg(countDistinct(col("ecb"))).as[Long].head() == 3)
    assert(ct.agg(countDistinct(col("gcm"))).as[Long].head() == 4)
  }

  test("wrong password: GCM authentication fails to null under tryDecrypt") {
    val bad = docs.select(ColumnCrypto.tryDecrypt(
      ColumnCrypto.encrypt(col("t"), pw), "not-the-password").as("d"))
    assert(bad.filter(col("d").isNotNull).count() == 0)
  }

  test("encryptColumns/decryptColumns round-trip the chosen columns only") {
    val enc = ColumnCrypto.encryptColumns(docs, pw, Seq("t"))
    assert(enc.schema("t").dataType.typeName == "binary")
    assert(enc.schema("id").dataType.typeName == "long")
    val dec = ColumnCrypto.decryptColumns(enc, pw, Seq("t"))
    assert(dec.orderBy("id").as[(Long, String)].collect().toSeq ==
      docs.orderBy("id").as[(Long, String)].collect().toSeq)
  }

  test("the aes path is native codegen expressions, not a UDF") {
    val p = docs.select(ColumnCrypto.encrypt(col("t"), pw).as("c"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }
}
