package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scratch roots under /tmp (stream-replay staging, bucketed
  * tables). The pid suffix keeps concurrent JVMs apart; this registry
  * keeps the suffix from becoming a leak — every registered root is
  * deleted on normal JVM exit, so repeated bench/verify/test runs don't
  * accumulate fixture-sized copies until /tmp fills. (A kill -9 still
  * leaks one root; the next run never reuses a dead pid's path, and the
  * hook bounds growth to crashed runs only.) */
object TmpRoots {
  private val registered =
    scala.collection.mutable.LinkedHashSet.empty[Path]

  def register(p: Path): Path = synchronized {
    if (registered.isEmpty)
      sys.addShutdownHook(registered.foreach(deleteRecursively))
    registered += p
    p
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // Best effort — a locked file must not abort the other deletions.
      try Files.walk(p)
        .sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      catch { case _: Throwable => () }
    }
}
