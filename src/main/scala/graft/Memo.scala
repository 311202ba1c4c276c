package graft

/** Keyed build-once cache: the one place the locking discipline lives.
  *
  * `TrieMap.getOrElseUpdate` alone may run the build thunk twice under
  * concurrent first calls — and for thunks that persist() a DataFrame or
  * write files, the losing copy stays pinned/half-written for the JVM
  * lifetime. Holding the map's lock around the build serializes first
  * calls; every builder in this codebase is pure plan construction, a
  * persist MARK, or a one-time bounded write, so the critical section is
  * short by design.
  *
  * Lifetime: entries live for the JVM (no eviction) — sized for this
  * program's shape of one or two sessions over at most three sfDirs. A
  * long-lived service would key by dir and evict on session close; at
  * 100 TB these intermediates are written tables and the cache doesn't
  * exist at all.
  */
final class Memo[K, V] {
  private val m = scala.collection.concurrent.TrieMap.empty[K, V]
  def apply(k: K)(build: => V): V =
    m.synchronized(m.getOrElseUpdate(k, build))
}
