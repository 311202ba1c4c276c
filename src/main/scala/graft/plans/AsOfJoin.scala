package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the whole-operator extension-point demo
  * (SURVEY.md §2.11 ladder (c): LogicalPlan + SparkStrategy + SparkPlan,
  * registered through `SparkSessionExtensions`).
  *
  * Semantics: for every left row, attach the right row with the same key
  * and the greatest time ≤ the left row's time (or nulls). Equivalent to
  * the window formulation used by the oracle query `q_join_self_asof`,
  * which `AsOfJoinSpec` cross-checks; this operator exists to exercise
  * the full planner extension path with a single-pass merge instead of a
  * union+window.
  *
  * Optional `toleranceMicros` bounds staleness (pandas merge_asof-style):
  * a match older than left time − tolerance yields nulls instead. The
  * unit is the time column's native unit — microseconds for timestamps,
  * raw values for integral time columns. Merge state stays O(1).
  *
  * Optional `rightTieBreak` makes ties deterministic: among right rows
  * sharing the exact same (key, time), the row with the GREATEST
  * tiebreak value is attached. Implemented entirely through
  * `requiredChildOrdering` — the right side sorts (key, time, tiebreak)
  * ascending and the merge's last-consumed-wins rule then lands on the
  * max tiebreak with zero extra merge state or comparisons. Without it,
  * the matched TIME is still deterministic (it's the tied value) but
  * which tied row's payload wins follows Spark's unstable sort.
  *
  * Scale shape: EnsureRequirements inserts hash exchanges on the key and
  * per-partition (key, time) sorts from the declared requirements, then
  * each partition pair streams through one forward-only merge — the same
  * distribution as a sort-merge join, with O(1) state (one buffered
  * right row) per partition.
  *
  * Keys/times are compared as longs: integral or timestamp types
  * (checked at construction) — the fixture shape (user_id, ts).
  */
object AsOfJoinPlan {
  private[plans] def comparableAsLong(t: DataType): Boolean = t match {
    case LongType | IntegerType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    rightTieBreak: Option[Expression] = None)
  extends BinaryNode {

  toleranceMicros.foreach(t =>
    require(t >= 0L, s"tolerance must be non-negative, got $t"))

  Seq(leftKey, rightKey, leftTime, rightTime).foreach { e =>
    require(AsOfJoinPlan.comparableAsLong(e.dataType),
      s"as-of key/time must be integral or timestamp, got ${e.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long] = None,
    rightTieBreak: Option[Expression] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // One hash exchange per side on the key; EnsureRequirements aligns the
  // two children's partitioning.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // Per-partition (key, time) sort on both sides enables the merge. The
  // optional right tiebreak is APPENDED to the right sort: the merge
  // consumes tied rows in tiebreak order and keeps the last, so the
  // max-tiebreak row wins deterministically — the whole tie semantics
  // costs one extra sort key, no merge-path changes.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  // Rows stream out in left-partition order, so the left child's hash
  // partitioning (on the key) and the declared sort survive: a downstream
  // groupBy/window on the key reuses the exchange instead of re-shuffling
  // — without this, the default UnknownPartitioning forces one. Asserted
  // by AsOfJoinSpec "downstream aggregation on the key reuses ...".
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    // IntegerType reads back with getInt; everything else allowed by
    // comparableAsLong (long, timestamp µs) is a physical long.
    val lKeyIsInt = lKey.dataType == IntegerType
    val lTimeIsInt = lTime.dataType == IntegerType
    val rKeyIsInt = rKey.dataType == IntegerType
    val rTimeIsInt = rTime.dataType == IntegerType
    val rightWidth = right.output.size
    val allOut = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // Bind against the *nullable* output schema: binding the right
      // side's original (non-nullable) attributes would elide the null
      // checks and read 0s out of the all-null row.
      val project = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      // Codegen'd (key, time) projections: one generated-code call per
      // row with primitive reads back out, replacing the r3 interpreted
      // Expression.eval + asInstanceOf[Number] boxing on the merge hot
      // path. Each projection reuses its result row, so values are
      // copied into locals before the next call.
      val lKT = UnsafeProjection.create(Seq(lKey, lTime))
      val rKT = UnsafeProjection.create(Seq(rKey, rTime))
      @inline def field(row: InternalRow, i: Int, isInt: Boolean): Long =
        if (isInt) row.getInt(i).toLong else row.getLong(i)
      // Tolerance (bounded staleness, pandas merge_asof-style): a match
      // older than t - tol is discarded at emit time. State stays O(1) —
      // only the latest match and its time are kept. None is genuinely
      // unbounded (not MaxValue: a MinValue sentinel time is staler
      // than MaxValue microseconds and must still match when unbounded).
      val unbounded = toleranceMicros.isEmpty
      val tol = toleranceMicros.getOrElse(0L)
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      var lastMatchTime = 0L
      lIter.map { l =>
        val lkt = lKT(l)
        val k = field(lkt, 0, lKeyIsInt)
        val t = field(lkt, 1, lTimeIsInt)
        // Advance the right side through everything at-or-before (k, t),
        // remembering the latest row of key k (rows arrive time-ascending
        // within a key, so the last one consumed wins). Ties: among right
        // rows sharing the exact same (key, time), "last consumed" is the
        // last in sort order — deterministic (max tiebreak) when
        // rightTieBreak is set, otherwise whatever Spark's unstable sort
        // produced (see AsOfJoinSpec "tied right timestamps").
        var advance = rNext != null
        while (advance) {
          val rkt = rKT(rNext)
          val rk = field(rkt, 0, rKeyIsInt)
          val rt = if (rk == k) field(rkt, 1, rTimeIsInt) else 0L
          if (rk < k || (rk == k && rt <= t)) {
            if (rk == k) {
              lastMatch = rNext.copy(); lastMatchKey = k; lastMatchTime = rt
            }
            rNext = if (rIter.hasNext) rIter.next() else null
            advance = rNext != null
          } else advance = false
        }
        // Overflow-safe staleness check: lastMatchTime <= t always holds
        // (matches are only consumed at rt <= t), but t - lastMatchTime
        // can exceed Long range for extreme integral sentinels, so
        // compare against a saturated threshold instead of subtracting.
        // Long.MinValue + tol cannot overflow (tol >= 0).
        val freshEnough = lastMatch != null && lastMatchKey == k &&
          (unbounded || {
            val threshold =
              if (t >= Long.MinValue + tol) t - tol else Long.MinValue
            lastMatchTime >= threshold
          })
        val m = if (freshEnough) lastMatch else nullRight
        project(joined(l, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected by
  * graft.GraftExtensions via injectPlannerStrategy. */
case class AsOfJoinStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTime, p.rightKey, p.rightTime,
        p.toleranceMicros, p.rightTieBreak) :: Nil
    case _ => Nil
  }
}

/** Public API:
  * `AsOf.join(purchases, signups, "user_id", "ts", "s_user", "s_ts")`.
  * Right-side columns should carry distinct names (rename before the
  * join) since the output is left.output ++ right.output; self-joins
  * need the two sides read (or aliased) independently — same caveat as
  * any custom binary plan built from analyzed children. Key and time
  * columns must be non-null: the merge reads them as primitives
  * (a null would read as 0, not match "unknown"); filter nulls out
  * before joining if the source allows them. */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      leftTimeCol: String,
      rightKeyCol: String,
      rightTimeCol: String,
      toleranceMicros: Option[Long] = None,
      rightTieBreakCol: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    GraftShims.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      GraftShims.expression(left.col(leftKeyCol)),
      GraftShims.expression(left.col(leftTimeCol)),
      GraftShims.expression(right.col(rightKeyCol)),
      GraftShims.expression(right.col(rightTimeCol)),
      toleranceMicros,
      rightTieBreakCol.map(c => GraftShims.expression(right.col(c)))))
  }
}
