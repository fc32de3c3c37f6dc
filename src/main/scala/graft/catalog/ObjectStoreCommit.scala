package graft.catalog

import java.io.IOException
import java.net.{InetAddress, InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.Duration

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Object-store commit publication — the "one implementation of one
  * method" the [[CommitPrimitive]] seam promises.
  *
  * Real object stores expose exactly the contract the log needs as a
  * CONDITIONAL WRITE: S3 `PUT` with `If-None-Match: *` (public API
  * since 2024), GCS `x-goog-if-generation-match: 0`, Azure Blob
  * `If-None-Match: *` — the store linearizes racing uploads of one key
  * and fails every loser with HTTP 412. [[HttpCommitPrimitive]] speaks
  * that dialect over plain HTTP; [[HttpCasServer]] is the
  * sandbox-realistic store stand-in (a loopback server that arbitrates
  * the compare-and-set server-side and lands winners as whole files,
  * so readers keep their ordinary listed-object view — the same
  * read-after-write visibility the real stores give committed PUTs).
  * [[LatencyCommitPrimitive]] injects the wide-area round-trip so
  * CommitBench can measure commit throughput at realistic put
  * latencies. Everything above the seam — optimistic conflicts,
  * snapshot isolation, checkpoints, vacuum — is untouched:
  * CommitRaceProcessSpec drives the same cross-process races through
  * this primitive as through the POSIX one.
  */
final class HttpCommitPrimitive(endpoint: String, root: Path)
    extends CommitPrimitive {

  private val storeRoot = root.toAbsolutePath.normalize

  // one client per primitive instance (per TxLog handle), like one
  // store client per writer process. Bounded waits everywhere: a wedged
  // store must surface as a commit error, not hang every writer on the
  // log forever (the publish loop's livelock guard can only trip on
  // thrown exceptions).
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  private val requestTimeout = Duration.ofSeconds(60)

  override def putIfAbsent(target: Path, content: Array[Byte]): Unit = {
    val rel = storeRoot.relativize(target.toAbsolutePath.normalize)
    require(!rel.startsWith(".."),
      s"putIfAbsent target $target escapes the store root $storeRoot")
    // segments are version-file names (v00000001.txt, _txlog) — encode
    // anyway so the seam never depends on that
    val key = (0 until rel.getNameCount).map(i =>
      java.net.URLEncoder.encode(rel.getName(i).toString, "UTF-8"))
      .mkString("/")
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint/$key"))
      .header("If-None-Match", "*").timeout(requestTimeout)
      .PUT(HttpRequest.BodyPublishers.ofByteArray(content))
      .build()
    val resp = try client.send(req, HttpResponse.BodyHandlers.ofString())
    catch {
      case e: InterruptedException => throw e
      // AMBIGUOUS OUTCOME: the request may have landed before the
      // response was lost (reset, timeout). Reporting plain failure
      // here would invite the classic double-apply: the caller retries
      // the transaction and publishes the same actions again under the
      // next version. Resolve by reading the slot back — exactly what a
      // real store client does after a lost conditional-PUT response.
      case e: Exception => resolveAmbiguousPut(key, target, content, e); return
    }
    resp.statusCode() match {
      case 200 | 201 => ()
      case 412 =>
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
      case c => throw new IOException(
        s"conditional PUT $endpoint/$key: unexpected HTTP $c ${resp.body()}")
    }
  }

  /** Post-failure slot read-back: our content at the key = the PUT won
    * and only the response was lost (success); different content = a
    * racer won (the ordinary lost-race signal); no content = the PUT
    * never landed (plain failure, safe to retry). Only a failed
    * read-back leaves the outcome genuinely unknown — surfaced loudly
    * so the caller reconciles before retrying.
    */
  private def resolveAmbiguousPut(key: String, target: Path,
      content: Array[Byte], cause: Exception): Unit = {
    val get = HttpRequest.newBuilder(URI.create(s"$endpoint/$key"))
      .timeout(requestTimeout).GET().build()
    val resp = try client.send(get, HttpResponse.BodyHandlers.ofByteArray())
    catch {
      case e: InterruptedException => throw e
      case e: Exception =>
        e.addSuppressed(cause)
        throw new IOException(
          s"conditional PUT to $endpoint/$key failed AND the read-back " +
            "failed: commit outcome UNKNOWN — reconcile the slot before " +
            "retrying the transaction", e)
    }
    resp.statusCode() match {
      case 200 if java.util.Arrays.equals(resp.body(), content) => ()
      case 200 =>
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
      case 404 => throw new IOException(
        s"conditional PUT to $endpoint/$key failed (slot empty — nothing " +
          "landed; retry is safe)", cause)
      case c => throw new IOException(
        s"read-back of $endpoint/$key after a failed PUT: unexpected " +
          s"HTTP $c", cause)
    }
  }
}

/** Loopback conditional-put store over a directory: `PUT /<key>` with
  * `If-None-Match: *` lands the body at `root/<key>` iff the key is
  * free (HTTP 412 otherwise — the loser signal), arbitrated
  * server-side like a real store's CAS. Winners become visible as
  * complete files via an atomic rename, so filesystem readers (the
  * log's list/read path) never observe partial content. `GET /<key>`
  * returns the committed bytes (the ambiguous-PUT read-back path).
  * PUTs without the precondition are rejected (400): the commit
  * protocol has no unconditional-overwrite path, and the server
  * enforcing that catches a client that silently dropped the header.
  */
final class HttpCasServer(root: Path) extends AutoCloseable {

  private val storeRoot = root.toAbsolutePath.normalize

  private val server = HttpServer.create(
    new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Exception =>
        val msg = s"server error: ${e.getMessage}".getBytes("UTF-8")
        ex.sendResponseHeaders(500, msg.length)
        ex.getResponseBody.write(msg)
    } finally ex.close()
  })
  server.start()

  def endpoint: String =
    s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}"

  private def handle(ex: HttpExchange): Unit = {
    val rel = ex.getRequestURI.getPath.stripPrefix("/").split("/")
      .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
    val target = rel.foldLeft(storeRoot)(_.resolve(_)).normalize
    if (!target.startsWith(storeRoot)) {
      respond(ex, 400, "key escapes the store root"); return
    }
    ex.getRequestMethod match {
      case "PUT" => handlePut(ex, target)
      case "GET" =>
        // winners land via atomic rename, so a read observes full
        // committed content or nothing — no lock needed
        if (Files.exists(target)) {
          val b = Files.readAllBytes(target)
          ex.sendResponseHeaders(200, if (b.length == 0) -1 else b.length)
          if (b.length > 0) ex.getResponseBody.write(b)
        } else respond(ex, 404, "no such key")
      case _ => respond(ex, 405, "PUT or GET only")
    }
  }

  private def handlePut(ex: HttpExchange, target: Path): Unit = {
    val ifNoneMatch = ex.getRequestHeaders.getFirst("If-None-Match")
    if (ifNoneMatch != "*") {
      respond(ex, 400, "commit PUTs must carry If-None-Match: *"); return
    }
    val body = ex.getRequestBody.readAllBytes()
    // the store-side linearization point: one winner per key, losers
    // see 412 — the body lands as a whole file (tmp + atomic rename),
    // never partially
    val won = this.synchronized {
      if (Files.exists(target)) false
      else {
        Files.createDirectories(target.getParent)
        val tmp = Files.createTempFile(target.getParent, ".put", ".tmp")
        Files.write(tmp, body)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }
    if (won) respond(ex, 200, "created") else respond(ex, 412, "exists")
  }

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }

  override def close(): Unit = server.stop(0)
}

/** Wide-area round-trip injector: every conditional put pays `rttMs`
  * before reaching the store — losers included, exactly like a remote
  * CAS whose rejection still costs the round trip.
  */
final class LatencyCommitPrimitive(inner: CommitPrimitive, rttMs: Long)
    extends CommitPrimitive {
  override def putIfAbsent(target: Path, content: Array[Byte]): Unit = {
    if (rttMs > 0) Thread.sleep(rttMs)
    inner.putIfAbsent(target, content)
  }
}
