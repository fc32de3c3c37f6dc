package graft.core

import java.nio.file.{Files, Path}

/** Shared local-filesystem helpers for the store layers (one
  * implementation of recursive delete and of the crash-safe directory
  * swap, instead of a copy per store).
  */
object FsUtils {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  /** Replace `live` with the fully-written `fresh` directory without a
    * window where the data exists only in a location no reader knows:
    * retire the old dir aside, move the new one in, then drop the
    * retired copy. A crash at any point leaves the data on disk in
    * `live` or `live.retire` — [[recoverSwap]] at open completes or
    * rolls back the exchange.
    */
  def swapDirectory(fresh: Path, live: Path): Unit = {
    val retire = live.resolveSibling(live.getFileName.toString + ".retire")
    deleteRecursively(retire) // stale from an earlier crash
    if (Files.exists(live)) Files.move(live, retire)
    Files.move(fresh, live)
    deleteRecursively(retire)
  }

  /** Open-time recovery for [[swapDirectory]]: a crash between its two
    * moves leaves `live` missing and the data in `live.retire` —
    * restore it; a crash after the second move leaves only the retired
    * copy to drop.
    */
  def recoverSwap(live: Path): Unit = {
    val retire = live.resolveSibling(live.getFileName.toString + ".retire")
    if (Files.exists(retire)) {
      if (!Files.exists(live)) Files.move(retire, live)
      else deleteRecursively(retire)
    }
  }
}
