package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.VideoOps
import graft.multimodal.VideoOps.{DeltaRecord, Frame}

/** The video frame delta-store (`multimodal.VideoOps`): byte-compatible
  * with the reference's recording container (`RtspClient.cs:113-202`)
  * and reconstructor (`VideoCollection.cs:11-55`), with GOP-parallel
  * decode and a stateful streaming encoder. The RTSP socket itself is
  * the caller's transport seam — the handshake strings and the wire
  * container are exercised here, the TCP loop is not.
  */
class VideoOpsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  // deterministic pseudo-frames: mostly-static background, k changing px
  private def frame(cam: String, seq: Long, size: Int,
      changes: Seq[(Int, Byte)]): Frame = {
    val data = Array.fill[Byte](size)(7.toByte)
    changes.foreach { case (i, v) => data(i) = v }
    Frame(cam, seq, 1000L * seq, data)
  }

  /** Straight port of `VideoCollection.ReconstructVideo`'s loop
    * (`VideoCollection.cs:19-52`) — the independent decode oracle that
    * pins byte-level container compatibility.
    */
  private def referenceReconstruct(container: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var previous: Array[Byte] = null
    var p = 0
    while (p < container.length) {
      val isFull = container(p) == 1
      val len = (container(p + 1) & 0xff) | ((container(p + 2) & 0xff) << 8) |
        ((container(p + 3) & 0xff) << 16) | ((container(p + 4) & 0xff) << 24)
      val payload = java.util.Arrays.copyOfRange(container, p + 5, p + 5 + len)
      if (isFull) { out += payload; previous = payload }
      else {
        val full = java.util.Arrays.copyOf(previous, previous.length)
        var i = 0
        while (i < payload.length) {
          val idx = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
            ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
          full(idx) = payload(i + 4)
          i += 5
        }
        out += full; previous = full
      }
      p += 5 + len
    }
    out.toSeq
  }

  test("delta encode matches the reference's format: full/diff policy, " +
      "[int32-LE index][value] pairs, and the 5-byte container header " +
      "that ReconstructVideo replays byte-for-byte") {
    val frames = (0L until 25L).map { s =>
      frame("cam1", s, 64, Seq((3, (s % 5).toByte), (40, (s % 3).toByte)))
    }
    val enc = VideoOps.encodeDelta(spark.createDataset(frames))
      .collect().sortBy(_.seq)

    // policy: frame 0 full, then diffs, next full at the 11th stored-
    // after-full frame (counter reaches 10)
    assert(enc.head.is_full)
    assert(enc.count(_.is_full) == 3) // seq 0, 11, 22
    assert(enc.filter(_.is_full).map(_.seq).toSeq == Seq(0L, 11L, 22L))
    // a diff record holds 5 bytes per changed byte
    val d1 = enc(1)
    assert(!d1.is_full)
    assert(d1.payload.length % 5 == 0 &&
      d1.payload.length < frames(1).data.length)

    // container round-trip through the C# loop port
    val container = VideoOps.containerBytes(enc.toSeq)
    val rebuilt = referenceReconstruct(container)
    assert(rebuilt.size == 25)
    rebuilt.zip(frames).foreach { case (got, f) =>
      assert(java.util.Arrays.equals(got, f.data), s"frame ${f.seq} differs")
    }
  }

  test("diff fallback: a mostly-changed frame stores full (diff >= frame, " +
      "RtspClient.cs:140-146), and a size change forces a key frame") {
    val a = frame("c", 0, 32, Nil)
    val b = Frame("c", 1, 1000L, Array.fill[Byte](32)(9)) // all 32 change
    val c = Frame("c", 2, 2000L, Array.fill[Byte](48)(9)) // size change
    val enc = VideoOps.encodeDelta(spark.createDataset(Seq(a, b, c)))
      .collect().sortBy(_.seq)
    assert(enc.forall(_.is_full), "diff would be >= frame; must store full")
  }

  test("GOP-parallel decode reconstructs every camera exactly, shuffled " +
      "input and all") {
    val frames = for {
      cam <- Seq("cam1", "cam2", "cam3")
      s <- 0L until 47L
    } yield frame(cam, s, 128,
      Seq(((s % 100).toInt, (s % 7).toByte), (99, cam.length.toByte)))
    val enc = VideoOps.encodeDelta(spark.createDataset(frames))
    // shuffle record order deliberately; decode must re-order per gop
    val decoded = VideoOps.decodeDelta(
      spark.createDataset(scala.util.Random.shuffle(enc.collect().toSeq)))
      .collect().map(f => (f.camera, f.seq) -> f.data).toMap
    assert(decoded.size == frames.size)
    frames.foreach { f =>
      assert(java.util.Arrays.equals(decoded((f.camera, f.seq)), f.data),
        s"${f.camera}/${f.seq} differs")
    }
    // and the stats view agrees with the policy
    val stats = VideoOps.deltaStats(enc).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats.keySet == Set("cam1", "cam2", "cam3"))
    assert(stats.values.forall(_ == 5L)) // 47 frames / key every 11th
  }

  test("streaming encode keeps per-camera recording state across " +
      "micro-batches: a new batch continues the GOP, not restarts it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Frame]
    val out = VideoOps.encodeDeltaStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("video_out")
      .outputMode("append").start()
    try {
      mem.addData(frame("c", 0, 64, Nil), frame("c", 1, 64, Seq((5, 9))))
      q.processAllAvailable()
      mem.addData(frame("c", 2, 64, Seq((6, 9))))
      q.processAllAvailable()
      val rows = spark.table("video_out").as[DeltaRecord]
        .collect().sortBy(_.seq)
      assert(rows.map(_.is_full).toSeq == Seq(true, false, false),
        "batch 2's first frame must continue the GOP from carried state")
      // the carried-state diffs still reconstruct exactly
      val f2 = VideoOps.applyDifferences(
        VideoOps.applyDifferences(rows(0).payload, rows(1).payload),
        rows(2).payload)
      assert(f2(6) == 9 && f2(5) == 7) // pos 5 reverted to base in frame 2
    } finally q.stop()
  }

  test("RTSP handshake strings match the reference's wire format and the " +
      "session id parses from a realistic SETUP response") {
    val setup = VideoOps.rtspSetupRequest("rtsp://cam.local:554/live", 1)
    assert(setup.startsWith("SETUP rtsp://cam.local:554/live/trackID=1 RTSP/1.0\r\n"))
    assert(setup.contains("CSeq: 1\r\n"))
    assert(setup.contains("Transport: RTP/AVP;unicast;client_port=8000-8001"))
    assert(setup.endsWith("\r\n\r\n"))
    val play = VideoOps.rtspPlayRequest("rtsp://cam.local:554/live", 2, "ABC123")
    assert(play.startsWith("PLAY rtsp://cam.local:554/live RTSP/1.0\r\n"))
    assert(play.contains("Session: ABC123"))
    val resp = "RTSP/1.0 200 OK\r\nCSeq: 1\r\nTransport: RTP/AVP;unicast\r\n" +
      "Session: 12345678;timeout=60\r\n\r\n"
    assert(VideoOps.parseSessionId(resp).contains("12345678"))
    assert(VideoOps.parseSessionId("RTSP/1.0 454 Session Not Found\r\n\r\n").isEmpty)
  }

  test("a frame arriving LATE across micro-batches is dropped, not " +
      "encoded against the wrong baseline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Frame]
    val out = VideoOps.encodeDeltaStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("video_late_out")
      .outputMode("append").start()
    try {
      mem.addData(frame("c", 0, 64, Nil), frame("c", 2, 64, Seq((5, 9))))
      q.processAllAvailable()
      // seq 1 is behind the encoded high-water mark (2): must be dropped
      mem.addData(frame("c", 1, 64, Seq((9, 9))), frame("c", 3, 64, Seq((6, 9))))
      q.processAllAvailable()
      val rows = spark.table("video_late_out").as[DeltaRecord]
        .collect().sortBy(_.seq)
      assert(rows.map(_.seq).toSeq == Seq(0L, 2L, 3L),
        "late seq 1 must be dropped")
      // the surviving chain still reconstructs frame 3 exactly
      val f3 = VideoOps.applyDifferences(
        VideoOps.applyDifferences(rows(0).payload, rows(1).payload),
        rows(2).payload)
      assert(f3(6) == 9 && f3(5) == 7)
    } finally q.stop()
  }

  /** Minimal loopback RTSP server: answers the SETUP/PLAY handshake
    * with realistic responses, then streams length-prefixed frames and
    * closes — the camera side of `RtspClient.cs:34-111`.
    */
  private def loopbackServer(frames: Seq[Array[Byte]], session: String)
      : (java.net.ServerSocket, Thread, java.util.concurrent.atomic.AtomicReference[String]) = {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val seenPlay = new java.util.concurrent.atomic.AtomicReference[String]("")
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val in = s.getInputStream
        val out = s.getOutputStream
        def readRequest(): String = {
          val sb = new StringBuilder
          var done = false
          while (!done) {
            val b = in.read()
            if (b < 0) done = true
            else {
              sb.append(b.toChar)
              if (sb.endsWith("\r\n\r\n")) done = true
            }
          }
          sb.toString
        }
        val setupReq = readRequest()
        assert(setupReq.startsWith("SETUP "), s"expected SETUP, got $setupReq")
        out.write(("RTSP/1.0 200 OK\r\nCSeq: 1\r\n" +
          "Transport: RTP/AVP;unicast;client_port=8000-8001\r\n" +
          s"Session: $session;timeout=60\r\n\r\n").getBytes("US-ASCII"))
        out.flush()
        val playReq = readRequest()
        seenPlay.set(playReq)
        out.write("RTSP/1.0 200 OK\r\nCSeq: 2\r\n\r\n".getBytes("US-ASCII"))
        out.flush()
        frames.foreach { f =>
          out.write(Array[Byte]((f.length & 0xff).toByte,
            ((f.length >> 8) & 0xff).toByte, ((f.length >> 16) & 0xff).toByte,
            ((f.length >> 24) & 0xff).toByte))
          out.write(f)
          out.flush()
        }
      } finally s.close()
    })
    t.setDaemon(true)
    t.start()
    (server, t, seenPlay)
  }

  test("loopback RTSP end-to-end: socket connect + SETUP/PLAY handshake, " +
      "receive loop records the delta container byte-identically to the " +
      "batch encoder, and the GOP-parallel decode round-trips exactly") {
    val raw = (0L until 30L).map(s =>
      frame("cam9", s, 96, Seq(((s % 90).toInt, (s % 11).toByte))).data)
    val (server, serverThread, seenPlay) = loopbackServer(raw, "SESS42")
    try {
      val client = new graft.multimodal.RtspSocketClient(
        "127.0.0.1", server.getLocalPort, "rtsp://127.0.0.1/live",
        retryDelayMs = 50, maxRetries = 2)
      val received = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      client.onFrame = received += _
      val sid = client.connect()
      assert(sid == "SESS42", "session id must parse from the SETUP response")
      val recorded = new java.io.ByteArrayOutputStream()
      val n = client.receive(recordTo = Some(recorded))
      client.disconnect()
      serverThread.join(5000)
      // the PLAY request carried the negotiated session (the wire side
      // of the handshake, RtspClient.cs:95-99)
      assert(seenPlay.get.contains("Session: SESS42"))
      // every frame arrived intact through the socket loop
      assert(n == 30 && received.size == 30)
      received.zip(raw).zipWithIndex.foreach { case ((got, want), i) =>
        assert(java.util.Arrays.equals(got, want), s"frame $i differs")
      }
      // the client's recording is BYTE-IDENTICAL to the batch encoder's
      // container for the same frames — one shared encodeStep policy
      val frames9 = raw.zipWithIndex.map { case (d, i) =>
        Frame("cam9", i.toLong, 1000L * i, d)
      }
      val viaBatch = VideoOps.containerBytes(
        VideoOps.encodeDelta(spark.createDataset(frames9)).collect().toSeq)
      assert(java.util.Arrays.equals(recorded.toByteArray, viaBatch),
        "socket recording must match the batch encoder byte-for-byte")
      // and the recorded container reconstructs exactly through the
      // distributed GOP-parallel decode
      val recs = VideoOps.parseContainer(recorded.toByteArray).zipWithIndex
        .map { case ((isFull, payload), i) =>
          DeltaRecord("cam9", i.toLong, 1000L * i, isFull, payload)
        }
      val decoded = VideoOps.decodeDelta(spark.createDataset(recs))
        .collect().sortBy(_.seq)
      assert(decoded.length == 30)
      decoded.zip(raw).foreach { case (f, want) =>
        assert(java.util.Arrays.equals(f.data, want),
          s"decoded frame ${f.seq} differs")
      }
    } finally server.close()
  }

  test("socket connect retries with bounded attempts, then fails loudly " +
      "(the reference retries forever, RtspClient.cs:39-55)") {
    // find a port with no listener: bind then close
    val probe = new java.net.ServerSocket(0)
    val deadPort = probe.getLocalPort
    probe.close()
    val client = new graft.multimodal.RtspSocketClient(
      "127.0.0.1", deadPort, "rtsp://127.0.0.1/x",
      retryDelayMs = 10, maxRetries = 2, connectTimeoutMs = 500)
    var retries = 0
    client.onRetrying = _ => retries += 1
    intercept[java.io.IOException](client.connect())
    assert(retries == 3, s"expected 3 attempts' retry events, got $retries")
  }

  test("parseContainer rejects truncated wire data instead of looping") {
    val rec = DeltaRecord("c", 0, 0, is_full = true, Array[Byte](1, 2, 3))
    val bytes = VideoOps.containerBytes(Seq(rec))
    val parsed = VideoOps.parseContainer(bytes)
    assert(parsed.size == 1 && parsed.head._1 &&
      java.util.Arrays.equals(parsed.head._2, Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      VideoOps.parseContainer(bytes.dropRight(1)))
    // a cut mid-HEADER of a later record must also reject, not silently
    // drop the trailing record
    val two = VideoOps.containerBytes(Seq(rec,
      DeltaRecord("c", 1, 1, is_full = true, Array[Byte](4, 5))))
    intercept[IllegalArgumentException](
      VideoOps.parseContainer(two.take(bytes.length + 2)))
  }
}
