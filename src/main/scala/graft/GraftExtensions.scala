package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer — the public `spark.sql.extensions` hook
  * (SURVEY.md §4 extension points). Registers the custom codegen'd
  * expressions so `expr("vec_dot(a, b)")` resolves in SQL and the
  * DataFrame DSL. Sessions opt in via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[functions.VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        // Arity-check here: an unchecked children(1) on a 1-arg call
        // would surface as a raw IndexOutOfBounds with no SQL context.
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"vec_dot requires exactly 2 arguments (array<float>, " +
              s"array<float>), got ${children.size}")
        functions.VecDot(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[functions.JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"jaro_winkler requires exactly 2 arguments (string, " +
              s"string), got ${children.size}")
        functions.JaroWinkler(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("span_extend"),
      new ExpressionInfo(classOf[functions.SpanExtend].getName, "span_extend"),
      (children: Seq[Expression]) => {
        if (children.size != 4)
          throw new IllegalArgumentException(
            s"span_extend requires exactly 4 arguments (string, string, " +
              s"int, int), got ${children.size}")
        functions.SpanExtend(children.head, children(1), children(2),
          children(3))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("span_extend_ascii"),
      new ExpressionInfo(classOf[functions.SpanExtendAscii].getName,
        "span_extend_ascii"),
      (children: Seq[Expression]) => {
        if (children.size != 4)
          throw new IllegalArgumentException(
            s"span_extend_ascii requires exactly 4 arguments (string, " +
              s"string, int, int), got ${children.size}")
        functions.SpanExtendAscii(children.head, children(1), children(2),
          children(3))
      }))
    extensions.injectPlannerStrategy(plans.AsOfJoinStrategy)
  }
}
