package graft.operators

import graft.Q

/** Scan / source / sink operators — SURVEY.md §2.1. */
object ScanQueries {
  val all: Vector[Q] = Vector()
}
