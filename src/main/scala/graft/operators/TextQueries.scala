package graft.operators

import graft.Q

/** Text-analysis operators over the documents corpus — SURVEY.md §2.10. */
object TextQueries {
  val all: Vector[Q] = Vector()
}
