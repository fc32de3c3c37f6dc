package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.catalog.{HttpCommitPrimitive, PosixCommitPrimitive}

/** Child-process worker for [[CommitRaceProcessSpec]]: publishes `n`
  * commits through the REAL conditional-PUT primitive against a shared
  * directory, racing whatever other PROCESSES are doing the same —
  * the cross-JVM form of the in-process TxLogSpec races (no shared
  * JVM state, no common lock objects; only the filesystem — or the
  * conditional-put store — arbitrates).
  *
  * args: <dir> <writerId> <nCommits> <primitive>
  * where <primitive> is `true`/`false` (the POSIX primitive's
  * forceNoLinks flag) or `http:<endpoint>` (the conditional-PUT store
  * dialect against the parent's [[graft.catalog.HttpCasServer]]).
  * Each published slot's content is "<writerId>:<seq>", so the parent
  * can verify exactly-once publication and zero lost updates.
  */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    val id = args(1)
    val n = args(2).toInt
    val prim: graft.catalog.CommitPrimitive =
      if (args(3).startsWith("http:"))
        new HttpCommitPrimitive(args(3).stripPrefix("http:"), dir)
      else new PosixCommitPrimitive(forceNoLinks = args(3).toBoolean)
    val re = "v(\\d{8,})\\.txt".r
    def head: Long = {
      val s = Files.list(dir)
      try s.iterator().asScala.flatMap(p =>
        re.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
        .foldLeft(0L)(math.max)
      finally s.close()
    }
    var published = 0
    var attempt = head + 1
    while (published < n) {
      val content = s"$id:$published".getBytes("UTF-8")
      try {
        prim.putIfAbsent(dir.resolve(f"v$attempt%08d.txt"), content)
        published += 1
        attempt += 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt = math.max(head, attempt) + 1
      }
      if (published % 7 == 3) Thread.sleep(1) // jitter the interleaving
    }
  }
}
