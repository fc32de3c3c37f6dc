package graft.core

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

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
  *    (and oracle-checkable). The determinism/leakage trade-off is
  *    stronger than whole-value equality: each 16-byte AES block is
  *    encrypted independently, so for plaintexts longer than one block
  *    ECB also leaks shared aligned prefixes and repeated blocks
  *    *within and across* values. Restrict ECB to short identifier-like
  *    keys; for a joinable handle next to non-leaking ciphertext, the
  *    better construction is an HMAC blind-index column alongside GCM
  *    ciphertext (or AES-SIV where the runtime offers it — Spark's
  *    aes_encrypt does not).
  *
  * SECURITY NOTE — key visibility in plan strings: the derived key is
  * baked into the Column as a binary literal, so it appears verbatim in
  * `explain()` output, the Spark UI SQL tab, event logs, and serialized
  * plans shipped to executors. That is inherent to expression-literal
  * key delivery; a deployment that must keep keys out of plan/telemetry
  * surfaces should deliver them via executor-side secret lookup inside
  * a UDF (trading away codegen) or encrypt at the storage/KMS layer
  * instead. This repo's own plan dumps (PlanDump) redact long hex
  * literals so PLANS.md never carries key material.
  *
  * The key is PBKDF2-SHA256(password, app salt, 120k) (32 bytes ->
  * AES-256): the reference's derive-from-password contract with real
  * stretching — a raw hash would let an attacker holding the encrypted
  * parquet test passwords at GPU hash speed. The salt is a fixed
  * application string (decrypt must re-derive the same key from the
  * password alone, same constraint as the reference's connection
  * string); pass a per-deployment salt to partition key spaces. Per-file
  * salts and rotation are the KMS's job in a lake. Derivation runs once
  * per Column construction on the driver — never per row.
  */
object ColumnCrypto {

  private val Iterations = 120000
  val DefaultSalt = "graft.columncrypto.v1"

  // 120k PBKDF2 iterations cost ~100 ms; a query touching several
  // columns re-derives the same key, so memoize per (password, salt).
  // NOTE: the key does NOT stay confined to driver memory — baked into
  // the Column literal it travels with the plan (explain output, UI SQL
  // tab, event logs, executor-serialized plans); see the security note
  // in the object Scaladoc.
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[Byte]]()

  /** AES-256 key bytes derived from a password (PBKDF2-SHA256, 120k). */
  def deriveKey(password: String, salt: String = DefaultSalt): Array[Byte] =
    keyCache.computeIfAbsent((password, salt), { case (pw, sa) =>
      val spec = new PBEKeySpec(pw.toCharArray,
        sa.getBytes("UTF-8"), Iterations, 256)
      SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
    })

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
