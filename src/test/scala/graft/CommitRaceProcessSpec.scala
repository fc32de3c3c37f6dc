package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.{CommitPrimitive, TxLog}

/** Cross-PROCESS commit races: two separate JVMs (no shared state, no
  * common locks — only the filesystem arbitrates) drive the
  * conditional-PUT primitive on one shared log directory, for BOTH the
  * hard-link CAS path and the fallback lock path. Plus an in-process
  * latency-injected primitive driving real TxLog writers, and the
  * truncated-range fail-safe.
  */
class CommitRaceProcessSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private val VersionRe = "v(\\d{8,})\\.txt".r

  private def spawn(dir: Path, id: String, n: Int,
      primSpec: String): Process = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    new ProcessBuilder(java, "-cp", System.getProperty("java.class.path"),
      "graft.CommitRaceChild", dir.toString, id, n.toString, primSpec)
      .inheritIO().start()
  }

  private def raceTwoProcesses(tag: String)(
      primFor: Path => (String, () => Unit)): Unit = {
    val dir = Files.createTempDirectory(s"graft_xrace_$tag")
    val (primSpec, close) = primFor(dir)
    val n = 25
    try {
      val a = spawn(dir, "A", n, primSpec)
      val b = spawn(dir, "B", n, primSpec)
      assert(a.waitFor() == 0 && b.waitFor() == 0, "children must exit 0")
      val s = Files.list(dir)
      val files = try s.iterator().asScala
        .filter(p => VersionRe.findFirstMatchIn(p.getFileName.toString).isDefined)
        .toVector.sortBy(_.getFileName.toString) finally s.close()
      // dense slots, one winner each: exactly 2n files, v1..v2n
      assert(files.size == 2 * n,
        s"expected ${2 * n} published versions, found ${files.size}")
      val versions = files.map(p => VersionRe.findFirstMatchIn(
        p.getFileName.toString).get.group(1).toLong)
      assert(versions == (1L to 2L * n).toVector,
        "version sequence must be dense — the CAS admits no gaps")
      // zero lost updates: every (writer, seq) pair appears EXACTLY once,
      // and no file is empty/partial (full-content visibility)
      val contents = files.map(p => new String(Files.readAllBytes(p), "UTF-8"))
      assert(contents.forall(_.matches("[AB]:\\d+")), "no partial contents")
      assert(contents.toSet.size == 2 * n, "every publish is unique")
      assert(contents.sorted ==
        (Seq("A", "B").flatMap(w => (0 until n).map(i => s"$w:$i"))).sorted,
        "each writer's every commit landed exactly once")
    } finally close()
  }

  test("two JVMs racing the hard-link CAS: one loser per slot, zero " +
      "lost updates, dense versions") {
    raceTwoProcesses("link")(_ => ("false", () => ()))
  }

  test("two JVMs racing the FALLBACK lock path (object-store shape)") {
    raceTwoProcesses("lock")(_ => ("true", () => ()))
  }

  test("two JVMs racing the conditional-PUT HTTP store " +
      "(If-None-Match: * dialect, server-side CAS)") {
    raceTwoProcesses("http") { dir =>
      val server = new graft.catalog.HttpCasServer(dir)
      (s"http:${server.endpoint}", () => server.close())
    }
  }

  test("latency-injected primitive: two TxLog writers' disjoint patches " +
      "both land through a slow conditional PUT") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_slowprim").toString
    final class SlowPrimitive(delayMs: Long) extends CommitPrimitive {
      override def putIfAbsent(target: Path, content: Array[Byte]): Unit = {
        Thread.sleep(delayMs) // widen the claim/validate window
        CommitPrimitive.posix.putIfAbsent(target, content)
      }
    }
    val logA = new TxLog(spark, root, primitive = new SlowPrimitive(40))
    val logB = new TxLog(spark, root, primitive = new SlowPrimitive(40))
    val f1 = logA.stage("t", Seq((1, "a")).toDF("id", "v"))
    val f2 = logA.stage("t", Seq((2, "b")).toDF("id", "v"))
    logA.commit(Seq(TxLog.Put("t", f1 ++ f2)))
    val base = logA.version
    // disjoint-file patches race through SLOW publishes
    val r1 = logA.stage("t", Seq((1, "a2")).toDF("id", "v"))
    val r2 = logB.stage("t", Seq((2, "b2")).toDF("id", "v"))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    @volatile var err: Throwable = null
    val ta = new Thread(() => {
      barrier.await()
      try logA.commit(Seq(TxLog.Patch("t", Seq(f1.head), r1)),
        readVersion = base)
      catch { case e: Throwable => err = e }
    })
    val tb = new Thread(() => {
      barrier.await()
      try logB.commit(Seq(TxLog.Patch("t", Seq(f2.head), r2)),
        readVersion = base)
      catch { case e: Throwable => err = e }
    })
    ta.start(); tb.start(); ta.join(); tb.join()
    if (err != null) throw err
    val bound = new TxLog(spark, root).snapshot().tables("t").toSet
    assert(bound == (r1 ++ r2).toSet,
      "both disjoint patches must land (commuting), neither lost")
  }

  test("latency-injected conditional-PUT store: two TxLog writers' " +
      "disjoint patches race through slow remote CAS publishes, both land") {
    import spark.implicits._
    import graft.catalog.{HttpCasServer, HttpCommitPrimitive,
      LatencyCommitPrimitive}
    val rootPath = Files.createTempDirectory("graft_httpprim")
    val root = rootPath.toString
    val server = new HttpCasServer(rootPath)
    try {
      def prim() = new LatencyCommitPrimitive(
        new HttpCommitPrimitive(server.endpoint, rootPath), 30)
      val logA = new TxLog(spark, root, primitive = prim())
      val logB = new TxLog(spark, root, primitive = prim())
      val f1 = logA.stage("t", Seq((1, "a")).toDF("id", "v"))
      val f2 = logA.stage("t", Seq((2, "b")).toDF("id", "v"))
      logA.commit(Seq(TxLog.Put("t", f1 ++ f2)))
      val base = logA.version
      val r1 = logA.stage("t", Seq((1, "a2")).toDF("id", "v"))
      val r2 = logB.stage("t", Seq((2, "b2")).toDF("id", "v"))
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      @volatile var err: Throwable = null
      val ta = new Thread(() => {
        barrier.await()
        try logA.commit(Seq(TxLog.Patch("t", Seq(f1.head), r1)),
          readVersion = base)
        catch { case e: Throwable => err = e }
      })
      val tb = new Thread(() => {
        barrier.await()
        try logB.commit(Seq(TxLog.Patch("t", Seq(f2.head), r2)),
          readVersion = base)
        catch { case e: Throwable => err = e }
      })
      ta.start(); tb.start(); ta.join(); tb.join()
      if (err != null) throw err
      val bound = new TxLog(spark, root).snapshot().tables("t").toSet
      assert(bound == (r1 ++ r2).toSet,
        "both disjoint patches must land through the remote CAS")
      // the store rejects an unconditional overwrite of a taken slot:
      // a raced re-publish of version 1 loses with 412 → the primitive's
      // FileAlreadyExistsException, exactly the CAS loser signal
      intercept[java.nio.file.FileAlreadyExistsException](
        prim().putIfAbsent(
          rootPath.resolve("_txlog").resolve(f"v${1L}%08d.txt"),
          "X".getBytes("UTF-8")))
    } finally server.close()
  }

  /** Man-in-the-middle for the lost-response commit hazard: PUTs are
    * (optionally) forwarded to the real store, then the connection is
    * closed WITHOUT a response — the transport failure whose outcome
    * the primitive must resolve by reading the slot back. GETs relay
    * normally (the read-back path must work while PUT responses are
    * being lost).
    */
  private final class DropPutResponseProxy(backend: String, forwardPut: Boolean)
      extends AutoCloseable {
    private val ss = new java.net.ServerSocket(
      0, 16, java.net.InetAddress.getLoopbackAddress)
    private val client = java.net.http.HttpClient.newHttpClient()
    @volatile private var closed = false
    private def serve(): Unit = {
      while (!closed) {
        val sock = try ss.accept() catch { case _: Exception => return }
        try {
          val in = new java.io.DataInputStream(sock.getInputStream)
          val head = new java.io.ByteArrayOutputStream()
          // scan to the CRLFCRLF header terminator WITHOUT reading past
          // it (a lookahead here would eat the first body byte)
          var tail = 0L
          var scanning = true
          while (scanning) {
            val b = in.read()
            if (b < 0) scanning = false
            else {
              head.write(b)
              tail = ((tail << 8) | b) & 0xffffffffL
              if (tail == 0x0d0a0d0aL) scanning = false
            }
          }
          val lines = new String(head.toByteArray, "ISO-8859-1").split("\r\n")
          val first = lines(0).split(" ")
          val (method, path) = (first(0), first(1))
          val len = lines.find(_.toLowerCase.startsWith("content-length:"))
            .map(_.split(":")(1).trim.toInt).getOrElse(0)
          val body = new Array[Byte](len); in.readFully(body)
          if (method == "PUT") {
            if (forwardPut) client.send(
              java.net.http.HttpRequest.newBuilder(
                java.net.URI.create(backend + path))
                .header("If-None-Match", "*")
                .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
                .build(),
              java.net.http.HttpResponse.BodyHandlers.discarding())
            sock.close() // the sabotage: response never reaches the client
          } else {
            val resp = client.send(
              java.net.http.HttpRequest.newBuilder(
                java.net.URI.create(backend + path)).GET().build(),
              java.net.http.HttpResponse.BodyHandlers.ofByteArray())
            val out = sock.getOutputStream
            out.write((s"HTTP/1.1 ${resp.statusCode()} ok\r\n" +
              s"Content-Length: ${resp.body().length}\r\n" +
              "Connection: close\r\n\r\n").getBytes("ISO-8859-1"))
            out.write(resp.body()); out.flush(); sock.close()
          }
        } catch { case _: Exception =>
          try sock.close() catch { case _: Exception => () } }
      }
    }
    private val worker = new Thread(() => serve())
    worker.setDaemon(true); worker.start()
    def endpoint: String =
      s"http://${ss.getInetAddress.getHostAddress}:${ss.getLocalPort}"
    override def close(): Unit = { closed = true; ss.close() }
  }

  test("a lost conditional-PUT response is resolved by slot read-back: " +
      "landed-then-lost = success (no double-apply), raced = lost race, " +
      "never-landed = plain retryable failure") {
    import graft.catalog.{HttpCasServer, HttpCommitPrimitive}
    val rootPath = Files.createTempDirectory("graft_httpamb")
    val server = new HttpCasServer(rootPath)
    val landed = new DropPutResponseProxy(server.endpoint, forwardPut = true)
    val dropped = new DropPutResponseProxy(server.endpoint, forwardPut = false)
    try {
      val slot = rootPath.resolve("_txlog").resolve("v00000001.txt")
      val content = "Add t f1\n".getBytes("UTF-8")
      // 1. the PUT lands, the response is lost → the read-back finds OUR
      //    content → success, exactly once (a blind retry here would be
      //    the double-apply the read-back exists to prevent)
      new HttpCommitPrimitive(landed.endpoint, rootPath)
        .putIfAbsent(slot, content)
      assert(Files.readAllBytes(slot).sameElements(content))
      // 2. response lost AND the slot holds someone else's commit → the
      //    ordinary lost-race signal, not an opaque IO failure
      val slot2 = rootPath.resolve("_txlog").resolve("v00000002.txt")
      new HttpCommitPrimitive(server.endpoint, rootPath)
        .putIfAbsent(slot2, "Add t OTHER\n".getBytes("UTF-8"))
      intercept[java.nio.file.FileAlreadyExistsException](
        new HttpCommitPrimitive(landed.endpoint, rootPath)
          .putIfAbsent(slot2, content))
      // 3. the PUT never reached the store → read-back sees an empty
      //    slot → plain IOException marked safe to retry, nothing landed
      val slot3 = rootPath.resolve("_txlog").resolve("v00000003.txt")
      val e = intercept[java.io.IOException](
        new HttpCommitPrimitive(dropped.endpoint, rootPath)
          .putIfAbsent(slot3, content))
      assert(e.getMessage.contains("slot empty"), e.getMessage)
      assert(!Files.exists(slot3))
      // 4. the sharp edge behind the old "retry is safe" wording: a
      //    timed-out PUT can land AFTER the 404 read-back, so the
      //    retry's 412 must re-read and recognize its OWN bytes as
      //    success — never misread its landed commit as a lost race
      val retry = new HttpCommitPrimitive(server.endpoint, rootPath)
      retry.putIfAbsent(slot3, content) // "late-landing" first attempt
      retry.putIfAbsent(slot3, content) // retry: 412 + equal bytes = ok
      assert(Files.readAllBytes(slot3).sameElements(content))
      // different bytes at the slot stay the ordinary lost-race signal
      intercept[java.nio.file.FileAlreadyExistsException](
        retry.putIfAbsent(slot3, "Add t LOSER\n".getBytes("UTF-8")))
    } finally { landed.close(); dropped.close(); server.close() }
  }

  test("the whole facade runs over the conditional-PUT HTTP store: " +
      "DML commits publish through HTTP CAS, a fresh handle replays them") {
    import spark.implicits._
    import graft.catalog.{GraftDatabase, HttpCasServer, HttpCommitPrimitive}
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_httpdb").toString
    // the store root is the DATABASE root (baseDir/name) — every
    // version file and checkpoint the facade publishes goes over HTTP
    val dbRoot = Paths.get(base, "clouddb")
    Files.createDirectories(dbRoot)
    val server = new HttpCasServer(dbRoot)
    try {
      def open() = GraftDatabase(spark, "clouddb", base,
        graft.core.Collation.Binary, None,
        new HttpCommitPrimitive(server.endpoint, dbRoot))
        .defineTable(TableDef("customer", "id"))
      val db = open()
      db.insert("customer", Seq((1, "ann", 30), (2, "bob", 40))
        .toDF("id", "name", "age"))
      db.updateMany("customer", org.apache.spark.sql.functions.col("id") === 1,
        Map("age" -> org.apache.spark.sql.functions.lit(31)))
      db.delete("customer", org.apache.spark.sql.functions.col("id") === 2)
      assert(db.count("customer") == 1)
      val replay = open()
      assert(replay.table("customer").select("age").head().getInt(0) == 31)
    } finally server.close()
  }

  test("truncated conflict range fails SAFE: a stale writer cannot " +
      "publish over vacuumed history") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_xtrunc").toString
    val log = new TxLog(spark, root)
    val f0 = log.stage("t", Seq((1, "a")).toDF("id", "v"))
    log.commit(Seq(TxLog.Put("t", f0)))
    val staleBase = log.version
    // move far past a checkpoint, then truncate the log below it
    (1 to 12).foreach { i =>
      log.commit(Seq(TxLog.Put("t", log.stage("t",
        Seq((1, s"v$i")).toDF("id", "v")))))
    }
    log.vacuum(keepVersions = 1, minAgeMs = 0)
    val stale = log.stage("t", Seq((1, "stale")).toDF("id", "v"))
    // the WARM writer still holds the truncated versions' parsed
    // actions (immutable, so still the truth): it adjudicates the REAL
    // conflict instead of the unverifiable-range fallback
    val e = intercept[TxLog.ConflictException](
      log.commit(Seq(TxLog.Put("t", stale)), readVersion = staleBase))
    assert(e.getMessage.contains("touched") || e.getMessage.contains("truncated"),
      e.getMessage)
    // a COLD writer (fresh cache — the restarted-process shape) cannot
    // inspect the vacuumed range at all: fail SAFE with the truncation
    // signal, never silently skip the unverifiable commits
    val cold = new TxLog(spark, root)
    val stale2 = cold.stage("t", Seq((1, "stale2")).toDF("id", "v"))
    val e2 = intercept[TxLog.ConflictException](
      cold.commit(Seq(TxLog.Put("t", stale2)), readVersion = staleBase))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
  }
}
