package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{ActionFlags, GraftDatabase, Permission, UserManager}

/** The reference's users/permissions surface (Users/UserManager.cs,
  * Permission.cs, ActionFlags.cs) on the facade: add/authenticate with
  * the auth-cache semantics, cascade removal of permission rows, the
  * default roles, and the enforcement wrapper (beyond-reference).
  */
class UsersSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(): GraftDatabase = {
    val base = Files.createTempDirectory("graft-users").toString
    GraftDatabase(spark, "userdb", base)
  }

  test("ActionFlags compose like the reference's [Flags] enum") {
    assert(ActionFlags.FullControl == 31)
    assert(ActionFlags.has(ActionFlags.FullControl, ActionFlags.Delete))
    assert(!ActionFlags.has(Permission.Default.editor.actions, ActionFlags.Delete))
    assert(ActionFlags.names(Permission.Default.operator.actions) ==
      Seq("Read", "Execute"))
  }

  test("addUser rejects case-insensitive duplicates; authenticate caches") {
    val users = freshDb().users
    assert(users.addUser("Alice", "s3cret", Permission.Default.editor))
    intercept[IllegalStateException](
      users.addUser("ALICE", "other", Permission.Default.viewer))

    assert(users.authenticate("alice", "s3cret"))
    assert(users.isAuthenticated("Alice"))
    // failed auth evicts the cache entry (UserManager.cs:49-56)
    assert(!users.authenticate("alice", "wrong"))
    assert(!users.isAuthenticated("alice"))
    // unknown user: false, no cache
    assert(!users.authenticate("bob", "x"))
  }

  test("password hashes are salted PBKDF2, never plaintext, never equal") {
    val h1 = UserManager.hashPassword("pw")
    val h2 = UserManager.hashPassword("pw")
    assert(h1 != h2, "salts must differ")
    assert(!h1.contains("pw"))
    assert(UserManager.verifyPassword("pw", h1))
    assert(UserManager.verifyPassword("pw", h2))
    assert(!UserManager.verifyPassword("pW", h1))
    assert(!UserManager.verifyPassword("pw", "legacy-plaintext"))
  }

  test("authorize honors resource wildcards, bitmasks, and multiple grants") {
    val users = freshDb().users
    users.addUser("carol", "pw", Permission.Default.viewer) // Read on *
    users.grant("carol", Permission("orders", ActionFlags.Write))

    assert(users.authorize("carol", "anything", ActionFlags.Read))
    assert(users.authorize("carol", "ORDERS", ActionFlags.Write))
    assert(!users.authorize("carol", "customer", ActionFlags.Write))
    assert(!users.authorize("carol", "orders", ActionFlags.Delete))
    assert(users.permissions("carol").map(_.resource) == Seq("*", "orders"))
  }

  test("removeUser cascades its permission rows (Permission.cs:8)") {
    val db = freshDb()
    val users = db.users
    users.addUser("dave", "pw", Permission.Default.admin)
    users.grant("dave", Permission("orders", ActionFlags.Read))
    assert(db.table(UserManager.PermsTable).count() == 2)
    users.removeUser("dave")
    assert(db.table(UserManager.UsersTable).count() == 0)
    assert(db.table(UserManager.PermsTable).count() == 0,
      "permissions must cascade with their user")
    assert(users.permissions("dave").isEmpty)
  }

  test("SecuredDatabase gates each facade operation on its ActionFlag") {
    val db = freshDb()
    db.defineTable(graft.dml.ConstrainedDml.TableDef("items", "id"))
    db.insert("items", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))

    val users = db.users
    users.addUser("viewer", "pw", Permission.Default.viewer)
    users.addUser("editor", "pw", Permission.Default.editor)

    val viewer = users.secured("viewer")
    assert(viewer.table("items").count() == 2)
    intercept[SecurityException](
      viewer.insert("items", Seq((3L, "c")).toDF("id", "name")))
    intercept[SecurityException](viewer.delete("items",
      org.apache.spark.sql.functions.col("id") === 1))
    intercept[SecurityException](viewer.sql("SELECT $.id FROM items"))

    val editor = users.secured("editor")
    editor.insert("items", Seq((3L, "c")).toDF("id", "name"))
    assert(editor.table("items").count() == 3)
    intercept[SecurityException](editor.delete("items",
      org.apache.spark.sql.functions.col("id") === 1))

    // upsert can OVERWRITE existing rows by PK, so Write alone must not
    // unlock it — it gates on Write + Update
    users.addUser("writeonly", "pw",
      Permission("items", ActionFlags.Write))
    intercept[SecurityException](users.secured("writeonly")
      .upsert("items", Seq((1L, "hacked")).toDF("id", "name")))
    editor.upsert("items", Seq((1L, "renamed")).toDF("id", "name"))
    assert(editor.table("items")
      .filter(org.apache.spark.sql.functions.col("id") === 1L)
      .collect().head.getString(1) == "renamed")
  }

  test("SQL DML through a secured handle requires the matching write " +
    "grant, not just Execute (no permission laundering via db.sql)") {
    val db = freshDb()
    db.defineTable(graft.dml.ConstrainedDml.TableDef("items", "id"))
    db.insert("items", Seq((1L, "a")).toDF("id", "name"))
    val users = db.users
    users.addUser("op", "pw", Permission.Default.operator) // Read|Execute
    val op = users.secured("op")
    assert(op.sql("SELECT $.id FROM items").count() == 1) // reads fine
    intercept[SecurityException](op.sql("DELETE items WHERE $.id = 1"))
    intercept[SecurityException](
      op.sql("""INSERT INTO items VALUES {"id": 9, "name": "z"}"""))
    intercept[SecurityException](
      op.sql("UPDATE items SET $.name = 'x' WHERE $.id = 1"))
    assert(db.table("items").count() == 1) // nothing mutated
  }
}
