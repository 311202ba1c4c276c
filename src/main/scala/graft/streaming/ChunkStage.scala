package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.StructType

/** The shared replay-staging discipline (r12 review: this shape had
  * grown into four drifting copies — UpsertStage, VecStage, DocStage,
  * QueryStage): stage a source frame into `chunks` single-file parquet
  * chunks keyed by `pmod(keyCol, chunks)`, so a `maxFilesPerTrigger = 1`
  * replay runs that many GENUINE micro-batches whose keys collide
  * across batches — every chunk spans the full key domain, where a
  * range-sliced split would make each merge disjoint and test nothing.
  *
  * The staging write runs once per (session, fixture dir) behind a Memo
  * latch; `schema` memoizes the file-listing + footer-read driver job a
  * timed bench rep would otherwise re-pay ([[graft.Memo]]); state
  * directories for the row's tables hang off the same per-dir root.
  * Roots register with [[graft.TmpRoots]] for end-of-JVM cleanup. */
private[graft] final class ChunkStage(
    rootName: String,
    keyCol: String,
    source: (SparkSession, String) => DataFrame,
    chunks: Int = 4) {
  require(chunks >= 1, s"chunks must be positive, got $chunks")

  private val root: java.nio.file.Path = graft.TmpRoots.register(
    java.nio.file.Paths.get(s"/tmp/$rootName",
      "jvm" + ProcessHandle.current().pid()))

  private def dirKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]+", "_")

  // Memo keyed on the OUTPUT PATH, not the session (r12 advice): two
  // sessions in one JVM stage the same directory, and a session-keyed
  // latch would let the second re-write a path a replay from the first
  // might be reading — phantom micro-batches. The path key makes every
  // writer of one directory share one latch; the temp-dir + atomic
  // rename below makes the publish all-or-nothing on top (a reader can
  // never list a half-staged directory, and a crashed staging attempt
  // leaves only an unreferenced temp dir the next attempt replaces).
  private val chunked = new graft.Memo[String, String]

  def inDir(s: SparkSession, dir: String): String = {
    val out = root.resolve(dirKey(dir)).resolve("in_chunks")
    chunked(out.toString) {
      val outP = new org.apache.hadoop.fs.Path(out.toString)
      val fs = outP.getFileSystem(s.sessionState.newHadoopConf())
      if (!fs.exists(outP)) {
        val tmp = root.resolve(dirKey(dir)).resolve("in_chunks.staging")
        graft.streaming.Snapshot.deleteRecursively(tmp.toString)
        val raw = source(s, dir)
        (0 until chunks).foreach { c =>
          raw.where(pmod(col(keyCol), lit(chunks)) === c)
            .coalesce(1)
            .write.mode(if (c == 0) "overwrite" else "append")
            .parquet(tmp.toString)
        }
        // Publish by rename. A SECOND PROCESS sharing this staging root
        // can publish between the exists probe and the rename (r13
        // advice): a rename refused (false) or FileAlreadyExists means
        // "another writer published the identical deterministic
        // content" — success, drop our copy. Hadoop rename-onto-an-
        // existing-DIRECTORY may instead nest src inside dst; detect
        // the nested dir and drop it too (same verdict).
        val tmpP = new org.apache.hadoop.fs.Path(tmp.toString)
        val renamed =
          try fs.rename(tmpP, outP)
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        val nested = new org.apache.hadoop.fs.Path(outP, tmpP.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
        if (!renamed) {
          if (!fs.exists(outP)) throw new IllegalStateException(
            s"staging publish failed and no winner exists at $out")
          graft.streaming.Snapshot.deleteRecursively(tmp.toString)
        }
      }
      out.toString
    }
  }

  def stateDir(dir: String, which: String = "state"): String =
    root.resolve(dirKey(dir)).resolve(which).toString

  private val schemaCache =
    new graft.Memo[(SparkSession, String), StructType]

  def schema(s: SparkSession, inDir: String): StructType =
    schemaCache((s, inDir))(s.read.parquet(inDir).schema)
}
