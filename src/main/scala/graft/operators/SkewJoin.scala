package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins whose hot keys overwhelm single
  * reducers — the deliberate fallback when AQE's runtime skew splitting
  * (which handles most cases and is left ON) is unavailable: streaming
  * joins, AQE-off deployments, or joins feeding an operator that must not
  * be re-planned.
  *
  * Mechanics: the probe side's rows get a uniform salt in [0, nSalts); the
  * build side is replicated once per salt. The join key becomes
  * (key, salt), splitting each hot key's reducer load nSalts ways. Cost:
  * build side shuffles nSalts× its size — use only when the build side is
  * small relative to the skew (the usual shape: a big skewed fact against
  * a modest dimension that broadcast can't quite hold).
  */
object SkewJoin {

  /** Inner equi-join on `key` with salt-split reducers.
    *
    * @param probe  large, skewed side
    * @param build  smaller side, replicated nSalts times
    * @param nSalts salt fan-out (≈ expected hot-key skew factor)
    */
  def saltedInner(probe: DataFrame, build: DataFrame, key: String,
                  nSalts: Int): DataFrame = {
    require(nSalts > 1, "nSalts must be > 1")
    // deterministic per-row salt: hash of the whole row, not rand() —
    // reruns and retried tasks salt identically
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.toIndexedSeq.map(col): _*)), lit(nSalts)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
