package graft.batch

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Directory swap that never deletes the live path before the new
  * layout is in place, with every FileSystem boolean checked (local FS
  * signals failure by returning false, not by throwing):
  *
  *   1. `live`  -> `live.old`   (live data set aside, still intact)
  *   2. `tmp`   -> `live`       (new layout becomes visible)
  *   3. delete `live.old`       (best-effort cleanup)
  *
  * If step 2 fails the old layout is restored (`live.old` -> `live`)
  * before throwing, so readers never observe a missing store. A crash
  * between 1 and 2 leaves the data recoverable at `live.old`; a fresh
  * run heals it (stale `.old` restored when `live` is absent, discarded
  * otherwise).
  *
  * This is the close-as-one-gets to atomic on rename-based filesystems
  * (HDFS/local). On object stores a writer should layer a manifest or
  * table format on top; the protocol here still never loses data.
  */
object AtomicSwap {

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Heal a crash between swap steps 1 and 2: if `livePath` is absent
    * but `livePath.old` survives, restore it. A merger MUST run this
    * BEFORE probing/reading the live store — the in-swap heal happens
    * too late for a reader that already planned "store absent →
    * batch-only" and would swap that partial result over the restored
    * data (silently discarding all accumulated state). Idempotent and
    * cheap (two metadata probes) when nothing is torn. */
  def heal(conf: Configuration, livePath: String): Unit = {
    val live = new Path(livePath)
    val old = new Path(livePath + ".old")
    val fs = live.getFileSystem(conf)
    if (fs.exists(old) && !fs.exists(live)) renameOrThrow(fs, old, live)
  }

  /** Swap the directory at `tmpPath` into place at `livePath`. */
  def swapInto(conf: Configuration, tmpPath: String, livePath: String): Unit = {
    val live = new Path(livePath)
    val tmp = new Path(tmpPath)
    val old = new Path(livePath + ".old")
    val fs = live.getFileSystem(conf)
    if (!fs.exists(tmp))
      throw new java.io.IOException(s"swap source missing: $tmp")
    // heal a previous crash: a leftover .old is restored only if the
    // live path vanished mid-swap, otherwise it is stale and dropped
    if (fs.exists(old)) {
      if (!fs.exists(live)) renameOrThrow(fs, old, live)
      else if (!fs.delete(old, true))
        throw new java.io.IOException(s"could not clear stale $old")
    }
    val hadLive = fs.exists(live)
    if (hadLive) renameOrThrow(fs, live, old)
    try renameOrThrow(fs, tmp, live)
    catch {
      case e: java.io.IOException =>
        if (hadLive && !fs.exists(live)) fs.rename(old, live) // rollback, best-effort
        throw e
    }
    if (hadLive) fs.delete(old, true) // best-effort; healed on next swap
  }
}
