package graft.operators

import graft.Q

/** Sort / limit / top-k / set operators — SURVEY.md §2.6–2.7. */
object SortSetQueries {
  val all: Vector[Q] = Vector()
}
