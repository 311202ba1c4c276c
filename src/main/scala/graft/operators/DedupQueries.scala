package graft.operators

import graft.Q

/** Deduplication operators (exact / prefix / MinHash-LSH) — SURVEY.md §2.10. */
object DedupQueries {
  val all: Vector[Q] = Vector()
}
