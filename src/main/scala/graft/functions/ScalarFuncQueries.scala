package graft.functions

import graft.Q

/** Scalar-function surface (string/date/math/array/json) — SURVEY.md §2.8. */
object ScalarFuncQueries {
  val all: Vector[Q] = Vector()
}
