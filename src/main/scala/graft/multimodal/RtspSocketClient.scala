package graft.multimodal

import java.io.{DataInputStream, EOFException, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** The RTSP ingest transport — the reference's socket loop
  * (`Video/Clients/RtspClient.cs:34-162`): TCP connect with retry,
  * SETUP → session parse → PLAY handshake, then a receive loop that
  * optionally RECORDS the stream as the delta container
  * (`[isFull:1][len:int32-LE][payload]` per frame, `AddHeader`,
  * `RtspClient.cs:195-202`).
  *
  * The recording policy is [[VideoOps.encodeStep]] — the ONE
  * implementation shared with the batch and streaming encoders, so the
  * bytes this client writes are identical to what [[VideoOps.encodeDelta]]
  * produces for the same frame sequence (and what
  * `VideoCollection.ReconstructVideo` replays).
  *
  * Deviation (correctness fix): the reference treats every TCP
  * `read()` chunk as one frame (`RtspClient.cs:122-127`) — broken
  * under TCP fragmentation/coalescing, where a frame arrives split
  * across reads or two frames fuse into one. Here the data stream is
  * length-prefix framed (`[len:int32-LE][frame]`), read with
  * `readFully`, so frame boundaries survive any packetization. EOF
  * (server close) ends the loop.
  */
final class RtspSocketClient(host: String, port: Int, url: String,
    retryDelayMs: Long = 5000L, maxRetries: Int = 3,
    connectTimeoutMs: Int = 5000) {

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: OutputStream = _
  private var cseq = 1
  private var sessionId: Option[String] = None

  /** Frame callback (the reference's `FrameReceived` event). */
  var onFrame: Array[Byte] => Unit = _ => ()
  /** Lifecycle callbacks (`Connected` / `Retrying` / `Disconnected`). */
  var onConnected: String => Unit = _ => ()
  var onRetrying: String => Unit = _ => ()
  var onDisconnected: String => Unit = _ => ()

  /** TCP connect with bounded retry (`ConnectAsync`,
    * `RtspClient.cs:34-56` — the reference retries forever; a bound
    * keeps a dead camera from wedging its caller), then the SETUP/PLAY
    * handshake. Returns the negotiated session id.
    */
  def connect(): String = {
    var attempt = 0
    var last: Exception = null
    while (socket == null && attempt <= maxRetries) {
      val s = new Socket()
      try {
        s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
        socket = s
        in = new DataInputStream(s.getInputStream)
        out = s.getOutputStream
      } catch {
        case e: java.io.IOException =>
          // close the failed attempt's socket: a long-lived ingest
          // process retrying many dead cameras must not leak one file
          // descriptor per attempt until GC
          try s.close() catch { case _: java.io.IOException => () }
          last = e
          attempt += 1
          onRetrying(s"Connection failed. Retrying in ${retryDelayMs}ms...")
          if (attempt <= maxRetries) Thread.sleep(retryDelayMs)
      }
    }
    if (socket == null)
      throw new java.io.IOException(s"RTSP connect failed after " +
        s"$maxRetries retries: $last")
    try {
      setup()
      play()
    } catch {
      // a failed handshake must not strand the established TCP
      // connection: callers retry with a fresh client
      case e: Throwable => disconnect(); throw e
    }
    onConnected("Connected to RTSP server.")
    sessionId.getOrElse {
      disconnect()
      throw new java.io.IOException("SETUP response carried no session id")
    }
  }

  /** SETUP → parse session (`RtspClient.cs:78-92`; the tolerant
    * [[VideoOps.parseSessionId]] replaces the reference's blind
    * response-line-4 index).
    */
  private def setup(): Unit = {
    send(VideoOps.rtspSetupRequest(url, nextCseq()))
    sessionId = VideoOps.parseSessionId(readResponse())
  }

  /** PLAY with the negotiated session (`RtspClient.cs:95-111`). */
  private def play(): Unit = {
    val sid = sessionId.getOrElse(
      throw new java.io.IOException("PLAY before a successful SETUP"))
    send(VideoOps.rtspPlayRequest(url, nextCseq(), sid))
    readResponse()
    ()
  }

  /** Receive loop (`ReceiveData`, `RtspClient.cs:113-162`): every frame
    * goes to [[onFrame]]; with `recordTo` set, frames delta-encode
    * through [[VideoOps.encodeStep]] and append to the output as the
    * reference's container format. Runs until the server closes the
    * stream or `maxFrames` arrive; returns the frame count.
    */
  def receive(recordTo: Option[OutputStream] = None,
      maxFrames: Int = Int.MaxValue,
      fullEvery: Int = VideoOps.FullFrameInterval): Int = {
    var prev: Array[Byte] = null
    var counter = 0
    var n = 0
    try {
      while (n < maxFrames) {
        val frame = readFrame() match {
          case Some(f) => f
          case None => return n // orderly EOF: server ended the stream
        }
        n += 1
        onFrame(frame)
        recordTo.foreach { os =>
          val (p2, c2, rec) = VideoOps.encodeStep(prev, counter,
            VideoOps.Frame("", n.toLong, 0L, frame), fullEvery)
          prev = p2
          counter = c2
          os.write(if (rec.is_full) 1 else 0)
          os.write(VideoOps.intLe(rec.payload.length))
          os.write(rec.payload)
          os.flush()
        }
      }
      n
    } finally recordTo.foreach(_.flush())
  }

  def disconnect(): Unit = {
    try if (socket != null) socket.close()
    finally {
      socket = null
      onDisconnected("Disconnected from RTSP server.")
    }
  }

  private def nextCseq(): Int = { val c = cseq; cseq += 1; c }

  private def send(request: String): Unit = {
    out.write(request.getBytes(StandardCharsets.US_ASCII))
    out.flush()
  }

  /** One CRLF-terminated response block (headers end at the blank
    * line), replacing the reference's single-read `GetResponse`
    * (`RtspClient.cs:204-209`) which truncates any response split
    * across TCP segments.
    */
  private def readResponse(): String = {
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val b = in.read()
      if (b < 0) done = true // peer closed mid-response
      else {
        sb.append(b.toChar)
        if (sb.length >= 4 && sb.endsWith("\r\n\r\n")) done = true
      }
    }
    sb.toString
  }

  /** One length-prefixed frame; None on orderly EOF before a header. */
  private def readFrame(): Option[Array[Byte]] = {
    val header = new Array[Byte](4)
    val first = in.read()
    if (first < 0) return None
    header(0) = first.toByte
    try in.readFully(header, 1, 3)
    catch { case _: EOFException => return None }
    val len = (header(0) & 0xff) | ((header(1) & 0xff) << 8) |
      ((header(2) & 0xff) << 16) | ((header(3) & 0xff) << 24)
    require(len >= 0 && len <= RtspSocketClient.MaxFrameBytes,
      s"implausible frame length $len")
    val buf = new Array[Byte](len)
    try { in.readFully(buf); Some(buf) }
    catch { case _: EOFException => None } // cut mid-frame: drop the tail
  }
}

object RtspSocketClient {
  /** Sanity bound on a single frame (64 MiB) — a corrupted length
    * prefix must fail loudly, not allocate the stream's claimed size.
    */
  val MaxFrameBytes: Int = 64 << 20
}
