package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level AES encryption — the analytic mapping of the reference's
  * password-encrypted data file (`Iot.Database/LiteDB/Engine/Disk/Streams/
  * AesStream.cs:1-243`, password via the connection string).
  *
  * A lakehouse deployment encrypts *files* with the storage layer / KMS
  * (out of the engine's scope, SURVEY §2.11); what the engine itself owns
  * is the value surface: deriving a key from the user's password and
  * encrypting chosen columns so parquet at rest never carries their
  * plaintext. Implemented on Spark's native `aes_encrypt`/`aes_decrypt`
  * (codegen expressions — no UDF in the path):
  *
  *  - mode "GCM" (default): randomized IV, authenticated — the right
  *    production choice; ciphertexts are non-deterministic by design.
  *  - mode "ECB": deterministic — equal plaintexts give equal
  *    ciphertexts, which keeps encrypted columns groupable/joinable
  *    (and oracle-checkable). The classic determinism/leakage trade-off:
  *    ECB leaks equality, exactly what a joinable encrypted key needs.
  *
  * The key is SHA-256(password) (32 bytes -> AES-256), mirroring the
  * reference's derive-from-password contract without its per-file salt
  * (the salt defends a file header we don't have; key rotation in a lake
  * is a KMS re-wrap, not a per-file salt).
  */
object ColumnCrypto {

  /** AES-256 key bytes derived from a password. */
  def deriveKey(password: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256")
      .digest(password.getBytes("UTF-8"))

  /** Encrypt a string/binary column. Deterministic = ECB (joinable,
    * equality-leaking), otherwise GCM (randomized, authenticated).
    */
  def encrypt(c: Column, password: String,
      deterministic: Boolean = false): Column =
    aes_encrypt(c.cast("binary"), lit(deriveKey(password)),
      lit(if (deterministic) "ECB" else "GCM"))

  /** Decrypt back to the original string. Wrong-password GCM decryption
    * fails authentication (loud error); `try_aes_decrypt` is the
    * null-on-mismatch variant a scrubbing pipeline would use.
    */
  def decrypt(c: Column, password: String,
      deterministic: Boolean = false): Column =
    aes_decrypt(c, lit(deriveKey(password)),
      lit(if (deterministic) "ECB" else "GCM")).cast("string")

  /** Null-on-failure decrypt (wrong key / tampered ciphertext -> null). */
  def tryDecrypt(c: Column, password: String,
      deterministic: Boolean = false): Column =
    try_aes_decrypt(c, lit(deriveKey(password)),
      lit(if (deterministic) "ECB" else "GCM")).cast("string")

  /** Encrypt `cols` of `df` in place (write-path hook: the facade calls
    * this before persisting a collection created with a password).
    */
  def encryptColumns(df: DataFrame, password: String, cols: Seq[String],
      deterministic: Boolean = false): DataFrame =
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, encrypt(col(c), password, deterministic)))

  /** Decrypt `cols` of `df` (read-path hook). */
  def decryptColumns(df: DataFrame, password: String, cols: Seq[String],
      deterministic: Boolean = false): DataFrame =
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, decrypt(col(c), password, deterministic)))
}
