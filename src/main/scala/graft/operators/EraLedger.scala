package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Monotonic write-era ledger for a saved vector layout — the ordering
  * `VectorIndex.liveDeduped`'s "earliest write era wins" repair needs
  * when file mtimes cannot provide it (r16 ADVICE: on a coarse-mtime
  * filesystem or object store, two append eras landing in the same
  * timestamp tick used to fall to lexicographic file-path order, which
  * is NOT era-ordered — a conflicting-content duplicate could silently
  * keep the LATER row).
  *
  * Protocol: `appendSaved` snapshots the layout's data-file names
  * before its write job, diffs the listing after the commit, and
  * records the new files under the next era sequence number in
  * `_graft_era_ledger.json` (a driver-side metadata file, rewritten
  * whole — file counts between compactions are bounded by the
  * WriteGeometry rules, the same scale fsck's listings already pay).
  * Build and compact files are intentionally UNLEDGERED: era 0 — and
  * `compactSaved` deletes the ledger outright, because after a
  * compact the whole layout is one (deduped) era. A torn append that
  * crashed before its ledger update is unledgered too; within its own
  * mtime tick it sorts before its (ledgered) retry, which re-ships
  * byte-identical rows, so the pick is content-identical either way.
  * The ledger REFINES the (mtime, path) ordering rather than
  * overriding it: rows sort by (mtime, era, path), so the sequence
  * decides exactly where mtime cannot (two eras in one timestamp
  * tick), a later unledgered era can never leapfrog an earlier
  * ledgered one across ticks, and layouts with no ledger behave
  * exactly as before.
  *
  * Concurrent appends on DIFFERENT ids may interleave their listing
  * diffs (both are additive, the single-writer contract allows them);
  * their relative era order is arbitrary but irrelevant — dedup
  * compares eras only WITHIN an id, and same-id concurrent appends
  * are already a contract violation. */
private[graft] object EraLedger {
  val FileName = "_graft_era_ledger.json"
  private implicit val formats: Formats = DefaultFormats

  case class Ledger(next: Long, files: Map[String, Long])

  def ledgerPath(root: Path): Path = new Path(root, FileName)

  /** Data-file NAMES (part-*.parquet, unique by write UUID) under the
    * layout root: flat files plus one partition-dir level (list_id=N);
    * metadata files and `_`/`.`-prefixed dirs (tombstones, staging)
    * are not data. */
  def listDataFiles(fs: FileSystem, root: Path): Set[String] = {
    val out = Set.newBuilder[String]
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && !n.startsWith("_") && !n.startsWith("."))
        fs.listStatus(st.getPath).foreach { f =>
          if (f.isFile && f.getPath.getName.startsWith("part-"))
            out += f.getPath.getName
        }
      else if (st.isFile && n.startsWith("part-")) out += n
    }
    out.result()
  }

  /** Reads the ledger, falling back to the `.tmp` replacement when the
    * primary is absent: [[write]] replaces via write-tmp → delete →
    * rename, and a crash between the delete and the rename would
    * otherwise read as "no ledger" and silently drop EVERY recorded
    * era (degrading liveDeduped to mtime ordering on exactly the
    * coarse-mtime stores the ledger exists for). The tmp at that point
    * is the complete new ledger, so preferring primary-then-tmp makes
    * the replacement crash-safe without an atomic-rename API. A stale
    * tmp next to a live primary (crash BEFORE the delete) is ignored
    * — that append's files read as era 0, the documented
    * torn-append degradation, never a wrong ledger. */
  def read(fs: FileSystem, root: Path): Ledger = {
    val p = ledgerPath(root)
    val src = if (fs.exists(p)) Some(p)
      else Some(new Path(root, FileName + ".tmp")).filter(fs.exists)
    src match {
      case None => Ledger(1L, Map.empty)
      case Some(f) =>
        val in = fs.open(f)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
          in.readFully(bytes)
          Serialization.read[Ledger](new String(bytes, "UTF-8"))
        } finally in.close()
    }
  }

  private def write(fs: FileSystem, root: Path, l: Ledger): Unit = {
    val p = ledgerPath(root)
    val tmp = new Path(root, FileName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(Serialization.write(l).getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Record every data file present now but absent from `before` under
    * the next era. Call with a pre-write listing snapshot, after the
    * write commits. */
  def recordNewFiles(fs: FileSystem, root: Path,
                     before: Set[String]): Unit = {
    val fresh = listDataFiles(fs, root) -- before
    if (fresh.nonEmpty) {
      val l = read(fs, root)
      write(fs, root,
        Ledger(l.next + 1L, l.files ++ fresh.iterator.map(_ -> l.next)))
    }
  }

  /** Drop the ledger (after a compact: the rewritten layout is one
    * era; unledgered = era 0 = earliest, and the counter restarts). */
  def clear(fs: FileSystem, root: Path): Unit = {
    fs.delete(ledgerPath(root), false)
    fs.delete(new Path(root, FileName + ".tmp"), false)
  }
}
