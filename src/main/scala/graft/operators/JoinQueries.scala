package graft.operators

import graft.Q

/** Join operators — SURVEY.md §2.3. */
object JoinQueries {
  val all: Vector[Q] = Vector()
}
