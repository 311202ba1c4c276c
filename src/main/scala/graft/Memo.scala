package graft

/** Keyed build-once cache: the one place the locking discipline lives.
  *
  * `TrieMap.getOrElseUpdate` alone may run the build thunk twice under
  * concurrent first calls — and for thunks that persist() a DataFrame or
  * write files, the losing copy stays pinned/half-written for the JVM
  * lifetime. Per-key latching: each key installs a lazy cell atomically
  * (`putIfAbsent` — creating a cell never runs the build), then forces it
  * outside any map-wide lock. The winning cell's `lazy val` serializes
  * concurrent first calls FOR THAT KEY only, so long builds (Lloyd
  * training, parquet rewrites) no longer block unrelated keys or cache
  * hits — only same-key waiters block, which is the semantics we want.
  *
  * Lifetime: entries live for the JVM (no eviction) — sized for this
  * program's shape of one or two sessions over at most three sfDirs. A
  * long-lived service would key by dir and evict on session close; at
  * 100 TB these intermediates are written tables and the cache doesn't
  * exist at all.
  */
final class Memo[K, V] {
  private final class Cell(build: () => V) { lazy val value: V = build() }
  private val m = scala.collection.concurrent.TrieMap.empty[K, Cell]
  def apply(k: K)(build: => V): V = {
    val cell = new Cell(() => build)
    (m.putIfAbsent(k, cell) match {
      case Some(existing) => existing
      case None           => cell
    }).value
  }
}
