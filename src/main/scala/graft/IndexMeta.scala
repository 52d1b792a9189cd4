package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.operators.{GridIndex, IvfIndex}

/** Sidecar metadata persisted beside a saved index.
  *
  * The stored `cell_id` / `list_id` columns are only meaningful in the
  * geometry that produced them: a load() that re-fits a GridSpec from the
  * rows (different cellsPerDim, or an extent widened by append-clamped
  * points) would enumerate query cells in a DIFFERENT geometry than the
  * stored ids and silently drop true results — breaking the losslessness
  * contract the pruning rests on (reference include/pktree.hpp:1048-1064's
  * bound argument). So the exact spec and the IVF centroid table are
  * written once at save() and read back verbatim at load(): the geometry
  * on disk is the single source of truth, never re-derived.
  *
  * The file lives inside the index directory with an underscore name
  * (like _SUCCESS), which Parquet directory listings ignore; it is
  * driver-side metadata (a few KB), written through the Hadoop FileSystem
  * API so the same code serves local disk, HDFS, and object stores.
  */
case class IndexMeta(
    version: Int,
    vecCol: String,
    idCol: String,
    dim: Int,
    grid: Option[IndexMeta.GridMeta],
    centroids: Option[Seq[IndexMeta.CentroidMeta]],
    // Every stored vector L2-unit-norm (within 1e-9), detected at save():
    // licenses serving cosine top-k from the L2 pruning machinery
    // (IndexAwareRules). Option so sidecars written before this field
    // parse unchanged (None = unknown = false).
    unitNorm: Option[Boolean] = None,
    // Per-dimension scalar-quantization params when the saved layout
    // carries an int8 code column (IvfIndex.SqCol). Option: sidecars
    // written before SQ existed parse unchanged (None = no codes).
    sq: Option[IndexMeta.SqMeta] = None,
    // Product-quantization codebooks when the layout carries the PQ code
    // column (IvfIndex.PqCol) — same backward-compat Option contract.
    pq: Option[IndexMeta.PqMeta] = None,
    // Per-list max member-to-centroid distances, written when the layout
    // carries PQ residuals (IvfIndex.PqResCol): the probe-ring bounds
    // searchPqExact's lossless list pruning consumes. Recomputed at every
    // save (never reused) — stale radii would be an UNSOUND bound after
    // appends. Same backward-compat Option contract.
    radii: Option[Seq[IndexMeta.RadiusMeta]] = None,
    // Per-cell row counts for GRID layouts (bounded by the cell count, a
    // few KB at 16⁴): GridIndex.seedRadius reads them to start batch-kNN
    // ring expansion at a radius that can actually satisfy k — cutting
    // the per-round Spark jobs sparse regions pay. A COST hint only:
    // stale counts after append/delete shift the seed, never correctness
    // (the kth-distance completion check governs exactness), so unlike
    // `radii` they survive appends. Same backward-compat Option contract.
    cellCounts: Option[Seq[IndexMeta.CellCountMeta]] = None,
    // Adaptive two-level refinement over the base `grid` (the
    // K-instantiable-split layout, GridIndex.AdaptiveSpec): refine
    // factor + the over-cap ("hot") base cell ids whose rows were
    // re-split one level finer at build time. The fine GridSpec is
    // DERIVED (width/refine, cells*refine — pure deterministic IEEE
    // arithmetic on the stored base doubles, identical to what
    // fitAdaptive computed), so only the data-dependent hot set needs
    // persisting; like every geometry here it is read back verbatim at
    // load(), never re-fit. Option: older sidecars parse unchanged. */
    adaptive: Option[IndexMeta.AdaptiveMeta] = None) {

  def gridSpec: Option[GridIndex.GridSpec] =
    grid.map(g => GridIndex.GridSpec(g.origin, g.width, g.cells))

  def adaptiveSpec: Option[GridIndex.AdaptiveSpec] =
    for { g <- grid; a <- adaptive } yield {
      val base = GridIndex.GridSpec(g.origin, g.width, g.cells)
      val fine = GridIndex.GridSpec(base.origin,
        base.width.map(_ / a.refine), base.cells.map(_ * a.refine))
      GridIndex.AdaptiveSpec(base, fine, a.refine, a.hot.toSet,
        a.deepHots.getOrElse(Nil).map(_.toSet), a.rowCap)
    }

  def ivfCentroids: Option[IvfIndex.Centroids] =
    centroids.map(_.map(c => (c.listId, c.centroid)))

  def sqParams: Option[IvfIndex.SqParams] =
    sq.map(s => IvfIndex.SqParams(s.vmin, s.step))

  def pqParams: Option[IvfIndex.PqParams] =
    pq.map(p => IvfIndex.PqParams(p.m, p.subDim,
      p.codebooks.map(_.map(c => (c.listId, c.centroid)))))

  def listRadiiMap: Option[Map[Int, Double]] =
    radii.map(_.map(r => r.listId -> r.radius).toMap)

  def cellCountsMap: Option[Map[Long, Long]] =
    cellCounts.map(_.map(c => c.cellId -> c.n).toMap)
}

object IndexMeta {
  case class GridMeta(origin: Seq[Double], width: Seq[Double], cells: Seq[Int])
  case class CentroidMeta(listId: Int, centroid: Seq[Double])
  case class SqMeta(vmin: Seq[Double], step: Seq[Double])
  case class PqMeta(m: Int, subDim: Int,
                    codebooks: Seq[Seq[CentroidMeta]])
  case class RadiusMeta(listId: Int, radius: Double)
  case class CellCountMeta(cellId: Long, n: Long)
  /** `deepHots` (levels >= 2 of the recursive split cascade) and
    * `rowCap` (the build-time cap, for fsck's saturation audit) are
    * Options so pre-recursion sidecars parse unchanged — absent means
    * the classic two-level layout with no at-rest cap claim. */
  case class AdaptiveMeta(refine: Int, hot: Seq[Long],
                          deepHots: Option[Seq[Seq[Long]]] = None,
                          rowCap: Option[Long] = None)

  private implicit val formats: Formats = DefaultFormats

  /** Underscore prefix: Spark/Parquet treat it as a non-data file. */
  val FileName = "_graft_meta.json"

  def of(vecCol: String, idCol: String, dim: Int,
         spec: Option[GridIndex.GridSpec],
         cents: Option[IvfIndex.Centroids],
         unitNorm: Boolean = false,
         sq: Option[IvfIndex.SqParams] = None,
         pq: Option[IvfIndex.PqParams] = None,
         radii: Option[Map[Int, Double]] = None,
         cellCounts: Option[Map[Long, Long]] = None,
         adaptive: Option[GridIndex.AdaptiveSpec] = None): IndexMeta =
    IndexMeta(1, vecCol, idCol, dim,
      spec.map(s => GridMeta(s.origin, s.width, s.cells)),
      cents.map(_.map { case (i, v) => CentroidMeta(i, v) }.toSeq),
      Some(unitNorm),
      sq.map(p => SqMeta(p.vmin, p.step)),
      pq.map(p => PqMeta(p.m, p.subDim,
        p.codebooks.map(_.map { case (i, v) => CentroidMeta(i, v) }.toSeq))),
      radii.map(_.toSeq.sorted.map { case (i, r) => RadiusMeta(i, r) }),
      cellCounts.map(_.toSeq.sorted.map { case (c, n) =>
        CellCountMeta(c, n) }),
      adaptive.map(a => AdaptiveMeta(a.refine, a.hot.toSeq.sorted,
        if (a.deepHots.isEmpty) None
        else Some(a.deepHots.map(_.toSeq.sorted)),
        a.rowCap)))

  def write(spark: SparkSession, indexPath: String, meta: IndexMeta): Unit = {
    val p = new Path(indexPath, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(Serialization.write(meta).getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, indexPath: String): Option[IndexMeta] = {
    val p = new Path(indexPath, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(Serialization.read[IndexMeta](new String(bytes, "UTF-8")))
      } finally in.close()
    }
  }
}
