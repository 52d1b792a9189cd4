package graft.operators

import org.apache.spark.sql.DataFrame

/** Call-scoped registry for operator-internal caches.
  *
  * Several dedup operators persist a multi-read intermediate (the hashed
  * shingle relation, the banded MinHash signatures, the multi-assigned
  * IVF relation) that both sides of a self-join consume. The operator
  * itself can never unpersist it: the returned DataFrame is lazy and
  * still reads the intermediate whenever the caller finally acts on it.
  * Left alone, those caches outlive the call and accumulate in a
  * long-lived session (VERDICT r4 hygiene finding).
  *
  * The seam: operators pass each such intermediate through `register`.
  * A pipeline that MATERIALIZES its result (so the intermediates are
  * provably no longer needed) wraps the building code in `collect`,
  * runs one eager action on the result, then unpersists everything the
  * scope captured. Without an active scope, `register` is a no-op and
  * the session-level caching behavior is exactly what it always was —
  * interactive users keep their warm intermediates.
  *
  * Driver-side and per-thread (plans are built single-threaded on the
  * driver); scopes nest — an inner `collect` hides the outer one, so an
  * operator composed inside another scoped pipeline cleans up at the
  * innermost boundary that owns materialization.
  */
private[graft] object CacheScope {

  private val active = new ThreadLocal[java.util.ArrayList[DataFrame]]

  /** Operators: route a just-persisted intermediate through here. */
  private[graft] def register(df: DataFrame): DataFrame = {
    val buf = active.get()
    if (buf != null) buf.add(df)
    df
  }

  /** Pipelines: run `body` with a fresh scope; returns (result, captured
    * intermediates). The caller MUST materialize the result before
    * unpersisting the captured frames — unpersist is always semantically
    * safe, but dropping them pre-materialization forfeits the reuse the
    * operators persisted them for. */
  private[graft] def collect[A](body: => A): (A, Seq[DataFrame]) = {
    val prev = active.get()
    val buf = new java.util.ArrayList[DataFrame]
    active.set(buf)
    try {
      val a = body
      val captured = Seq.tabulate(buf.size())(buf.get)
      (a, captured)
    } finally active.set(prev)
  }
}
