package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video frame delta-store — the reference's RTSP recording pipeline
  * (`Video/Clients/RtspClient.cs:113-199`) and its reconstructor
  * (`Video/VideoCollection.cs:11-55`), re-expressed as distributed
  * transforms over a frames table.
  *
  * The reference records a camera stream as a delta container: a full
  * frame every `FullFrameInterval` (10) frames, otherwise a difference
  * frame listing only the changed bytes as `[int32-LE index][value]`
  * pairs — falling back to a full frame when the diff would not be
  * smaller (`RtspClient.cs:131-152`). Each record carries a 5-byte
  * header: `[isFull:1][length:int32-LE]` (`AddHeader`,
  * `RtspClient.cs:195-202`). [[encodeDelta]] produces byte-compatible
  * records; [[containerBytes]] concatenates them into the exact file
  * format `VideoCollection.ReconstructVideo` replays.
  *
  * Scale shapes:
  *  - ENCODE is inherently sequential per camera (the full-frame
  *    counter resets on stored-full decisions, which depend on prior
  *    diff sizes), so it folds per camera group — cameras encode in
  *    parallel, frames within one camera in order, state is one frame.
  *  - DECODE is better than the reference's sequential file replay:
  *    every full frame starts an independent GOP (group-of-pictures),
  *    so reconstruction runs parallel across (camera, gop) groups —
  *    a running count of full frames assigns the gop, one shuffle.
  *  - The RTSP transport itself (TCP SETUP/PLAY, `RtspClient.cs:34-111`)
  *    is a socket loop, not analytics: [[rtspSetupRequest]] /
  *    [[rtspPlayRequest]] build the real handshake strings and
  *    [[parseContainer]] ingests the real wire container, but the
  *    socket is the caller's (or a test harness's) — the same external
  *    seam as the media codecs in [[Multimodal]].
  *
  * Deviation (correctness fix): the reference's diff encoder indexes
  * the previous frame by the current frame's offsets and its
  * reconstructor patches a copy of the previous frame, so any frame
  * SIZE change corrupts the replay (`RtspClient.cs:176-189` with
  * `VideoCollection.cs:37-46`). Here a size change forces a full
  * frame.
  */
object VideoOps {

  val FullFrameInterval = 10

  /** One encoded record of the delta store. */
  final case class DeltaRecord(camera: String, seq: Long, ts_us: Long,
      is_full: Boolean, payload: Array[Byte])

  /** One raw frame. */
  final case class Frame(camera: String, seq: Long, ts_us: Long,
      data: Array[Byte])

  // ---- delta encode (RtspClient.cs:113-199) -------------------------------

  /** The reference's per-frame recording decision
    * (`RtspClient.cs:131-152`): full frame when there is no previous,
    * the cadence counter expired, the size changed, or the diff would
    * not be smaller; else a difference frame. ONE implementation shared
    * by the batch and streaming encoders — the policy cannot diverge.
    */
  private[multimodal] def encodeStep(prev: Array[Byte], counter: Int, f: Frame,
      fullEvery: Int): (Array[Byte], Int, DeltaRecord) = {
    val (isFull, payload) =
      if (prev == null || counter >= fullEvery ||
          f.data.length != prev.length) (true, f.data)
      else {
        val diff = frameDifferences(prev, f.data)
        if (diff.length >= f.data.length) (true, f.data)
        else (false, diff)
      }
    (f.data, if (isFull) 0 else counter + 1,
      DeltaRecord(f.camera, f.seq, f.ts_us, isFull, payload))
  }

  /** Encode raw frames into delta records, per camera in seq order.
    * Parallel ACROSS cameras; within one camera the fold streams over a
    * SORTED partition iterator carrying one previous frame + the
    * full-frame counter — a camera's recording never has to fit in
    * memory, matching the one-frame state claim above.
    */
  def encodeDelta(frames: Dataset[Frame],
      fullEvery: Int = FullFrameInterval): Dataset[DeltaRecord] = {
    import frames.sparkSession.implicits._
    frames.repartition(col("camera"))
      .sortWithinPartitions("camera", "seq")
      .as[Frame]
      .mapPartitions { it =>
        var cam: String = null
        var prev: Array[Byte] = null
        var counter = 0
        it.map { f =>
          if (f.camera != cam) { cam = f.camera; prev = null; counter = 0 }
          val (p2, c2, rec) = encodeStep(prev, counter, f, fullEvery)
          prev = p2; counter = c2
          rec
        }
      }
  }

  /** Streaming twin of [[encodeDelta]]: the per-camera recording state
    * (previous frame + full-frame counter, `RtspClient.cs:118-121`)
    * lives in keyed group state, so a live camera feed delta-encodes
    * incrementally across micro-batches — the stream side never
    * shuffles more than the camera-key exchange, and state is bounded
    * at one frame per camera.
    */
  def encodeDeltaStream(frames: Dataset[Frame],
      fullEvery: Int = FullFrameInterval): Dataset[DeltaRecord] = {
    import frames.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    frames.groupByKey(_.camera).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[Frame],
          state: org.apache.spark.sql.streaming.GroupState[CamState]) =>
        var (prev, counter, lastSeq) = state.getOption
          .map(s => (s.prev, s.counter, s.lastSeq))
          .getOrElse((null: Array[Byte], 0, Long.MinValue))
        val out = it.toVector.sortBy(_.seq).flatMap { f =>
          // a frame at or before the encoded high-water mark arrived
          // LATE across batches: its diff baseline is gone, and
          // emitting it would patch the wrong frame at decode — drop
          // it (the reference's socket loop cannot see reordering; a
          // distributed source can)
          if (f.seq <= lastSeq) None
          else {
            lastSeq = f.seq
            val (p2, c2, rec) = encodeStep(prev, counter, f, fullEvery)
            prev = p2; counter = c2
            Some(rec)
          }
        }
        state.update(CamState(prev, counter, lastSeq))
        out.iterator
    }
  }

  /** Keyed recording state of one camera: previous frame, full-frame
    * cadence counter, and the encoded seq high-water mark (late-frame
    * guard).
    */
  final case class CamState(prev: Array[Byte], counter: Int, lastSeq: Long)

  /** Changed bytes as `[int32-LE index][value]` pairs
    * (`GetFrameDifferences`, `RtspClient.cs:176-189`).
    */
  def frameDifferences(prev: Array[Byte], cur: Array[Byte]): Array[Byte] = {
    require(prev.length == cur.length, "diff requires equal frame sizes")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < cur.length) {
      if (cur(i) != prev(i)) {
        out.write(intLe(i)); out.write(cur(i).toInt & 0xff)
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- decode (VideoCollection.cs:11-55, but GOP-parallel) ---------------

  /** Reconstruct full frames from delta records. Each full frame opens
    * an independent GOP, so groups decode in parallel — one shuffle on
    * (camera, gop), bounded state (one frame) per group.
    */
  def decodeDelta(records: Dataset[DeltaRecord]): Dataset[Frame] = {
    import records.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("camera").orderBy("seq")
    val withGop = records.toDF()
      .withColumn("gop", sum(when(col("is_full"), 1L).otherwise(0L)).over(w))
    withGop.as[(String, Long, Long, Boolean, Array[Byte], Long)]
      .groupByKey { case (cam, _, _, _, _, gop) => (cam, gop) }
      .flatMapGroups { (key: (String, Long),
          it: Iterator[(String, Long, Long, Boolean, Array[Byte], Long)]) =>
        val cam = key._1
        val ordered = it.toVector.sortBy(_._2)
        var prev: Array[Byte] = null
        ordered.map { case (_, seq, ts, isFull, payload, _) =>
          val full =
            if (isFull) payload
            else {
              require(prev != null, s"diff record without a key frame: $seq")
              applyDifferences(prev, payload)
            }
          prev = full
          Frame(cam, seq, ts, full)
        }
      }
  }

  /** Patch a copy of the previous frame with `[index][value]` pairs
    * (`ReconstructVideo`, `VideoCollection.cs:37-46`).
    */
  def applyDifferences(prev: Array[Byte], diff: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(prev, prev.length)
    var i = 0
    while (i + 4 < diff.length) {
      val idx = leInt(diff, i)
      out(idx) = diff(i + 4)
      i += 5
    }
    out
  }

  // ---- wire container (AddHeader / ReconstructVideo framing) --------------

  /** Serialize records (one camera, seq order) into the reference's
    * container file format: `[isFull:1][len:int32-LE][payload]`* —
    * byte-compatible with `VideoCollection.ReconstructVideo`'s input.
    */
  def containerBytes(records: Seq[DeltaRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.sortBy(_.seq).foreach { r =>
      out.write(if (r.is_full) 1 else 0)
      out.write(intLe(r.payload.length))
      out.write(r.payload)
    }
    out.toByteArray
  }

  /** Parse a container byte stream back into (is_full, payload) records
    * — the ingest side of the reference's recording file.
    */
  def parseContainer(bytes: Array[Byte]): Seq[(Boolean, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Array[Byte])]
    var p = 0
    while (p + 5 <= bytes.length) {
      val isFull = bytes(p) == 1
      val len = leInt(bytes, p + 1)
      require(p + 5 + len <= bytes.length, s"truncated container at $p")
      out += ((isFull, java.util.Arrays.copyOfRange(bytes, p + 5, p + 5 + len)))
      p += 5 + len
    }
    // a cut mid-HEADER must also reject, not silently drop the record
    require(p == bytes.length, s"truncated container header at $p")
    out.toSeq
  }

  /** Frames-per-GOP / compression diagnostics over a delta store. */
  def deltaStats(records: Dataset[DeltaRecord]): DataFrame = {
    records.toDF().groupBy("camera")
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("is_full"), 1L).otherwise(0L)).as("n_full"),
        sum(length(col("payload"))).as("stored_bytes"))
  }

  // ---- RTSP handshake strings (RtspClient.cs:78-111; socket = caller's) ---

  def rtspSetupRequest(url: String, cseq: Int): String =
    s"SETUP $url/trackID=1 RTSP/1.0\r\nCSeq: $cseq\r\n" +
      "Transport: RTP/AVP;unicast;client_port=8000-8001\r\n\r\n"

  def rtspPlayRequest(url: String, cseq: Int, session: String): String =
    s"PLAY $url RTSP/1.0\r\nCSeq: $cseq\r\nSession: $session\r\n\r\n"

  /** Session id from a SETUP response (`RtspClient.cs:84-86`, made
    * tolerant: the reference indexes response line 4 blindly).
    */
  def parseSessionId(setupResponse: String): Option[String] =
    setupResponse.split("\r\n").collectFirst {
      case l if l.toLowerCase.startsWith("session:") =>
        l.substring(8).trim.split(";").head.trim
    }

  private[multimodal] def intLe(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leInt(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
}
