package graft.operators

import graft.Q

/** Vector / embedding operators (norms, kNN, centroids) — SURVEY.md §2.10. */
object VectorQueries {
  val all: Vector[Q] = Vector()
}
