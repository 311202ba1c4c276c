package graft.operators

import graft.Q

/** Window-function operators — SURVEY.md §2.5. */
object WindowQueries {
  val all: Vector[Q] = Vector()
}
