package graft.operators

/** The write-geometry rule for every partitioned at-rest index writer
  * (SURVEY §4): repartition by the partitionBy column (one file per
  * touched bucket per write — the rolling-ingest file-population fix
  * measured in BASELINE.md r13), with [[MaxFileRows]] as the safety net
  * for a mis-sized bucket knob: a hot bucket degrades to a few bounded
  * files instead of one giant single-task file. Applies to builds,
  * appends AND compactors — compaction is where a hot bucket holds the
  * most rows, so the cap matters most exactly there.
  */
private[graft] object WriteGeometry {
  /** Rows per parquet file cap (`maxRecordsPerFile`). Narrow index rows
    * (id + hash + bucket) at ~50 B/row put a 4M-row file near the
    * 100–200 MB parquet sweet spot. */
  val MaxFileRows: Int = 4000000
}
