package graft.core

import java.security.MessageDigest

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.{KmsClient, LocalWrapKmsClient}

/** Transparent file-at-rest encryption for a database directory — the
  * Spark-native replacement for the reference's whole-datafile AES
  * stream (`LiteDB/Engine/Disk/Streams/AesStream.cs:50-110`: PBKDF2 of
  * the password + per-file salt → AES over every page) and the
  * `RebuildOptions.Password` re-encryption path
  * (`LiteDB/Engine/Structures/RebuildOptions.cs:14`).
  *
  * Re-expressed on Parquet Modular Encryption (PME), which Spark's
  * parquet source supports natively ("columnar encryption"): every data
  * file is written with an encrypted footer and AES-GCM-encrypted
  * pages, keyed by per-file data keys that are envelope-wrapped by a
  * key-encryption key, itself wrapped by a master key the KMS client
  * supplies. Unlike the reference's ECB-per-page scheme this is
  * AUTHENTICATED encryption — tampered pages fail the GCM tag — and
  * the wrapping means a passphrase rotation (REBUILD with a new
  * password) re-wraps without custom cipher code.
  *
  * [[PassphraseKmsClient]] stands in for a real KMS: it derives master
  * keys from a passphrase carried in the standard
  * `parquet.encryption.key.access.token` slot (PBKDF2-HMAC-SHA256, the
  * same derivation family as the reference's `Rfc2898DeriveBytes`,
  * with the key id as deterministic salt — per-file randomness comes
  * from the data keys, where the reference used a stored salt). At a
  * real deployment the same two factory properties point at the lake's
  * KMS client instead; nothing else in the engine changes.
  *
  * Scale posture: encryption runs inside the parquet writer/reader on
  * the EXECUTORS (AES-NI), the driver only sets options; key material
  * stores in each file's footer, so files stay self-contained and
  * relocatable, and the per-token KMS cache bounds PBKDF2 work to once
  * per passphrase per JVM.
  */
object FileCrypto {
  // Format note: the key-derivation input (passphrase + per-database
  // salt + key id) and the salt file location (<root>/_crypto.salt) are
  // the feature's v1 on-disk contract — any change needs a legacy
  // derivation fallback keyed off the footer's key metadata, or it
  // bricks existing stores.

  /** Single uniform master-key id: footer + every column under one key,
    * the whole-file posture of the reference's AesStream.
    */
  val MasterKeyId = "graft-master"

  /** Conf key carrying the per-database salt to the KMS client. */
  val SaltConfKey = "graft.encryption.salt"

  /** Read/write options enabling PME for one passphrase + per-database
    * salt. Safe to set on reads of PLAINTEXT files too (the factory
    * only engages for files with encrypted footers), which is what lets
    * REBUILD flip a database between plaintext and encrypted states.
    *
    * The salt (random, persisted under the database root — see
    * `GraftDatabase.ensureCryptoSalt`) is the reference's stored-salt
    * property (`AesStream.cs:57-79`): without it, every database
    * sharing a passphrase would derive the SAME master key, and one
    * precomputed PBKDF2 table per candidate password would test
    * against any database at rest.
    */
  def options(passphrase: String, salt: String): Map[String, String] = {
    require(passphrase.nonEmpty, "empty database password")
    require(salt.nonEmpty, "empty crypto salt")
    Map(
      "parquet.crypto.factory.class" ->
        "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
      "parquet.encryption.kms.client.class" ->
        classOf[PassphraseKmsClient].getName,
      "parquet.encryption.key.access.token" -> passphrase,
      SaltConfKey -> salt,
      // distinct instance id per (passphrase, salt): the per-JVM
      // KMS/KEK caches key on (token, instance id), so two databases
      // sharing a passphrase but not a salt must not share clients
      "parquet.encryption.kms.instance.id" ->
        s"graft-${digest(s"$passphrase:$salt")}",
      "parquet.encryption.uniform.key" -> MasterKeyId)
  }

  private def digest(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Tail magic of a parquet file: "PARE" = encrypted footer, "PAR1" =
    * plaintext. The cheap open-time probe behind the facade's loud
    * password-mismatch errors (the reference reads its first-byte
    * encryption indicator the same way, `AesStream.cs:71-77`).
    */
  def isEncryptedFile(path: String): Boolean = {
    val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(path))
    try {
      if (ch.size < 4) false
      else {
        ch.position(ch.size - 4)
        val buf = java.nio.ByteBuffer.allocate(4)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        new String(buf.array(), "US-ASCII") == "PARE"
      }
    } finally ch.close()
  }
}

/** PME `KmsClient` deriving master keys from the access-token
  * passphrase. `LocalWrapKmsClient` handles the wrap/unwrap (AES-GCM
  * envelope) and memoizes master keys, so PBKDF2 runs once per
  * (passphrase, key id) per JVM.
  */
final class PassphraseKmsClient extends LocalWrapKmsClient {

  override protected def initializeInternal(): Unit = {
    if (kmsToken == null || kmsToken.isEmpty ||
        kmsToken == KmsClient.KEY_ACCESS_TOKEN_DEFAULT)
      throw new KeyAccessDeniedException(
        "database password missing: this file is encrypted — open the " +
          "database with its password (carried as " +
          "parquet.encryption.key.access.token)")
  }

  override protected def getMasterKeyFromServer(keyId: String): Array[Byte] = {
    // per-(passphrase, database salt, keyId) AES-256 master key — the
    // reference's Rfc2898DeriveBytes(password, storedSalt)
    // (AesStream.cs:85-91); the random salt rides the hadoop conf from
    // FileCrypto.options
    val salt = hadoopConfiguration.getTrimmed(FileCrypto.SaltConfKey, "")
    if (salt.isEmpty) throw new KeyAccessDeniedException(
      s"missing ${FileCrypto.SaltConfKey}: the database's crypto salt " +
        "must accompany its password")
    val spec = new PBEKeySpec(kmsToken.toCharArray,
      s"graft-pme:$salt:$keyId".getBytes("UTF-8"), 120000, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }
}
