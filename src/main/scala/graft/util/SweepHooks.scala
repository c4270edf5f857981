package graft.util

/** Cross-module notification that a catalog table / warehouse location was
  * SWEPT (round-19 verdict #6): session-lifetime caches keyed by table
  * name — Bm25Index's hybrid probe registry is the motivating case — must
  * release their entry when retention retires the table, or a swept index
  * leaves a cached frame pinned for the rest of the session. The sweep
  * paths (TableRetention.sweep, VersionedTable.sweepStale,
  * Bm25Index.sweepVersions) publish every swept name here; cache owners
  * register a listener once at init. Listeners must be idempotent and
  * cheap (a map removal + unpersist) — they run inline in the sweep.
  */
object SweepHooks {

  private val hooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  /** Register a listener invoked with each swept table/location name. */
  def register(f: String => Unit): Unit = hooks.add(f)

  /** Publish one swept name to every registered listener. */
  def swept(name: String): Unit = hooks.forEach(f => f(name))
}
