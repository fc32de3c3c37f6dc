package graft.catalog

import java.security.SecureRandom
import java.util.UUID

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dml.ConstrainedDml.{Cascade, Fk, TableDef}

/** The reference's users/permissions layer
  * (`Iot.Database/Users/ActionFlags.cs:1-13`, `Permission.cs:1-69`,
  * `User.cs:1-9`, `UserManager.cs:1-70`) re-expressed on the facade:
  * users and permissions are ordinary constraint-checked tables
  * (`sys_users`, `sys_permissions`) — the same `Sys_Users` system-table
  * idea the reference uses — so permission rows cascade-delete with their
  * user exactly as `Permission.UserId`'s `TableConstraint.Cascading`
  * attribute declares.
  *
  * Two deliberate divergences, both documented:
  *  - passwords are salted PBKDF2-SHA256, not the reference's
  *    acknowledged placeholder (`UserManager.cs:58-62` stores the raw
  *    password);
  *  - an `authorize` check + [[SecuredDatabase]] wrapper exist here —
  *    the reference declares the permission model but never enforces it
  *    (UserManager is unreferenced outside its own file). At cluster
  *    scale the lakehouse catalog's ACLs remain the real boundary; this
  *    layer gives library users the same in-engine gate the reference
  *    surface promises.
  */
object ActionFlags {
  val NoAction: Int = 0
  val Read: Int = 1 << 0
  val Write: Int = 1 << 1
  val Delete: Int = 1 << 2
  val Update: Int = 1 << 3
  val Execute: Int = 1 << 4
  val FullControl: Int = Read | Write | Delete | Update | Execute

  def has(actions: Int, flag: Int): Boolean = (actions & flag) == flag

  def names(actions: Int): Seq[String] =
    Seq(Read -> "Read", Write -> "Write", Delete -> "Delete",
      Update -> "Update", Execute -> "Execute")
      .collect { case (f, n) if has(actions, f) => n }
}

/** One grant: `resource` is a table name or `"*"` (Permission.cs:13). */
final case class Permission(resource: String = "*",
    actions: Int = ActionFlags.NoAction)

object Permission {
  /** The reference's default roles (Permission.cs:22-66). */
  object Default {
    def admin: Permission = Permission("*", ActionFlags.FullControl)
    def editor: Permission = Permission("*",
      ActionFlags.Read | ActionFlags.Write | ActionFlags.Update)
    def viewer: Permission = Permission("*", ActionFlags.Read)
    def operator: Permission = Permission("*",
      ActionFlags.Read | ActionFlags.Execute)
    def guest: Permission = Permission("*", ActionFlags.Read)
  }
}

final class UserManager(db: GraftDatabase) {
  import UserManager._

  db.defineTable(TableDef(UsersTable, "user_id"))
  db.defineTable(TableDef(PermsTable, "perm_id",
    fks = Seq(Fk("user_id", UsersTable, "user_id", onDelete = Cascade))))

  private val spark = db.spark
  // the reference's authenticated-user cache (UserManager.cs:11): filled
  // on successful auth, evicted on failure or unknown user
  private val authCache =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // grants cache (same precedent as authCache): a SecuredDatabase gates
  // EVERY operation, and re-scanning sys_users + sys_permissions per call
  // would launch two collect jobs each time. Invalidated on any mutation
  // of the user/permission tables.
  private val grantsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Permission]]()

  private def invalidateGrants(): Unit = grantsCache.clear()

  private def usersDf: Option[DataFrame] =
    if (db.tableExists(UsersTable)) Some(db.table(UsersTable)) else None

  private def findUser(username: String): Option[(String, String)] =
    usersDf.flatMap { u =>
      // username uniqueness is case-insensitive (UserManager.cs:21
      // OrdinalIgnoreCase); bounded single-row lookup
      u.filter(lower(col("username")) === username.toLowerCase)
        .select("user_id", "password_hash").collect().headOption
        .map(r => (r.getString(0), r.getString(1)))
    }

  /** AddUser (UserManager.cs:19-37): rejects a duplicate username
    * case-insensitively, stores the salted hash, grants the initial
    * permission.
    */
  def addUser(username: String, password: String,
      permission: Permission): Boolean = {
    require(username.nonEmpty, "username must be non-empty")
    if (findUser(username).isDefined)
      throw new IllegalStateException(s"Duplicate username found: $username")
    val uid = UUID.randomUUID().toString
    import spark.implicits._
    db.insert(UsersTable,
      Seq((uid, username, hashPassword(password))).toDF(
        "user_id", "username", "password_hash"))
    grantByUid(uid, permission)
    true
  }

  /** Grant an additional permission to an existing user. */
  def grant(username: String, permission: Permission): Unit =
    grantByUid(findUser(username).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"unknown user: $username")),
      permission)

  private def grantByUid(uid: String, permission: Permission): Unit = {
    import spark.implicits._
    db.insert(PermsTable,
      Seq((UUID.randomUUID().toString, uid,
        permission.resource, permission.actions)).toDF(
        "perm_id", "user_id", "resource", "actions"))
    invalidateGrants()
  }

  /** Authenticate (UserManager.cs:39-59): success caches the user,
    * failure or unknown user evicts any stale cache entry.
    */
  def authenticate(username: String, password: String): Boolean =
    findUser(username) match {
      case None =>
        authCache.remove(username.toLowerCase); false
      case Some((_, stored)) =>
        if (verifyPassword(password, stored)) {
          authCache.add(username.toLowerCase); true
        } else {
          authCache.remove(username.toLowerCase); false
        }
    }

  def isAuthenticated(username: String): Boolean =
    authCache.contains(username.toLowerCase)

  /** Remove a user; the FK's Cascade drops their permission rows with
    * them (Permission.cs:8 `TableConstraint.Cascading`).
    */
  def removeUser(username: String): Unit = {
    findUser(username).foreach { case (uid, _) =>
      db.delete(UsersTable, col("user_id") === uid)
    }
    authCache.remove(username.toLowerCase)
    invalidateGrants()
  }

  /** All grants of a user, wildcard first (cached; see grantsCache). */
  def permissions(username: String): Seq[Permission] = {
    val key = username.toLowerCase
    val cached = grantsCache.get(key)
    if (cached != null) cached
    else {
      val loaded = findUser(username).toSeq.flatMap { case (uid, _) =>
        if (!db.tableExists(PermsTable)) Nil
        else db.table(PermsTable).filter(col("user_id") === uid)
          .select("resource", "actions").collect()
          .map(r => Permission(r.getString(0), r.getInt(1))).toSeq
          .sortBy(p => (p.resource != "*", p.resource))
      }
      grantsCache.put(key, loaded)
      loaded
    }
  }

  /** Whether `username` holds `action` on `resource`: a grant matches if
    * its resource is `"*"` or equals the resource case-insensitively, and
    * its bitmask covers the action.
    */
  def authorize(username: String, resource: String, action: Int): Boolean =
    permissions(username).exists(p =>
      (p.resource == "*" || p.resource.equalsIgnoreCase(resource)) &&
        ActionFlags.has(p.actions, action))

  def requireAuthorized(username: String, resource: String,
      action: Int): Unit =
    if (!authorize(username, resource, action))
      throw new SecurityException(
        s"user '$username' lacks ${ActionFlags.names(action).mkString("|")} " +
          s"on '$resource'")

  /** A facade view that checks this user's grants before every operation
    * (beyond the reference, which declares the flags but never gates).
    */
  def secured(username: String): SecuredDatabase =
    new SecuredDatabase(db, this, username)
}

object UserManager {
  val UsersTable = "sys_users"
  val PermsTable = "sys_permissions"

  // PBKDF2-SHA256, 120k iterations (OWASP's 2023 floor for SHA-256),
  // 16-byte random salt; encoded as pbkdf2_sha256$iter$saltHex$hashHex.
  // Deliberate upgrade over UserManager.cs:58-68, whose Hash/Verify are
  // placeholder identity functions (plaintext at rest).
  private val Iterations = 120000
  private val rng = new SecureRandom()

  private def pbkdf2(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def hashPassword(password: String): String = {
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    s"pbkdf2_sha256$$$Iterations$$${hex(salt)}$$${hex(pbkdf2(password, salt, Iterations))}"
  }

  def verifyPassword(password: String, stored: String): Boolean =
    stored.split("\\$") match {
      case Array("pbkdf2_sha256", iter, saltHex, hashHex) =>
        java.security.MessageDigest.isEqual(
          pbkdf2(password, unhex(saltHex), iter.toInt), unhex(hashHex))
      case _ => false
    }
}

/** Permission-gated facade view: read surfaces need Read, inserts Write,
  * in-place modifications Update, deletes Delete, and string-query
  * execution (LiteDB SQL / NL find) Execute — the reference's
  * ActionFlags taxonomy applied to the operations this facade actually
  * exposes.
  */
final class SecuredDatabase(db: GraftDatabase, users: UserManager,
    username: String) {
  import ActionFlags._

  private def check(resource: String, action: Int): Unit =
    users.requireAuthorized(username, resource, action)

  def table(name: String): DataFrame = {
    check(name, Read); db.table(name)
  }
  def query(name: String): FluentQuery = {
    check(name, Read); db.query(name)
  }
  def count(name: String): Long = { check(name, Read); db.count(name) }

  def insert(name: String, rows: DataFrame): Unit = {
    check(name, Write); db.insert(name, rows)
  }
  def upsert(name: String, rows: DataFrame): Unit = {
    // upsert both inserts new rows AND overwrites existing ones by PK —
    // gate on Write + Update, or a Write-only grant could replace any row
    // whose PK it knows
    check(name, Write); check(name, Update); db.upsert(name, rows)
  }
  def update(name: String, rows: DataFrame): Long = {
    check(name, Update); db.update(name, rows)
  }
  def updateMany(name: String, predicate: org.apache.spark.sql.Column,
      transforms: Map[String, org.apache.spark.sql.Column]): Long = {
    check(name, Update); db.updateMany(name, predicate, transforms)
  }
  def delete(name: String, predicate: org.apache.spark.sql.Column): Unit = {
    check(name, Delete); db.delete(name, predicate)
  }

  /** String-query surfaces execute arbitrary reads — gate on Execute at
    * the database scope (`"*"`), since the touched tables aren't known
    * until translation. SQL **DML** additionally requires the matching
    * write grant: `db.sql` persists INSERT/UPDATE/DELETE, so an
    * Execute-only role (the reference's operator) must not reach a
    * mutation the typed surfaces would have refused.
    */
  def sql(liteSql: String): DataFrame = {
    check("*", Execute)
    liteSql.trim.takeWhile(!_.isWhitespace).toUpperCase match {
      case "INSERT" => check("*", Write)
      case "UPDATE" => check("*", Update)
      case "DELETE" => check("*", Delete)
      case _ => ()
    }
    db.sql(liteSql)
  }
  def find(nlQuery: String): DataFrame = {
    check("*", Execute); db.find(nlQuery)
  }
}
