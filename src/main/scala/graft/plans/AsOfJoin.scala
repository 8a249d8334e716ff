package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the fourth and final leg of the §2.13 Catalyst
  * ladder (scalar expressions → BottomKByHash aggregate →
  * IntegerizeSampleFilter rule → a whole custom operator: LogicalPlan +
  * SparkStrategy + SparkPlan, registered through SparkSessionExtensions).
  *
  * Semantics: for every left row, attach the LAST right row of the same
  * key whose time is at-or-before the left row's time ("latest prior
  * observation"), null-extended when none exists — the join the
  * reference's click-attribution query needs (j11) and one Spark has no
  * physical operator for. The composed formulations cost either a
  * per-row inequality join (explodes at scale) or a union + running
  * `last(ignoreNulls)` window (one shuffle of BOTH sides into one
  * sorted pass — what `ScaleOps.j11AsOfJoin` does).
  *
  * This operator declares `ClusteredDistribution(key)` on both children
  * and a `(key, time, tieBreak…)` sort, so EnsureRequirements plans
  * exactly one exchange + sort per side (co-partitioned, AQE-compatible
  * — the same contract SortMergeJoinExec rides), and the merge itself is
  * a single forward pass per partition holding ONE buffered right row —
  * O(1) state, no window frame, no per-key grouping buffer. At 100 TB
  * that means: shuffle each side once by key, stream both sorted runs,
  * never materialize a per-key history.
  *
  * Keys and times are referenced BY NAME, not by `Attribute`: the node
  * then carries no expressions for analyzer/optimizer rules to remap, so
  * self-join lineage (both sides derived from one scan, as in j11b's
  * clicks/purchases split) survives `DeduplicateRelations` rewriting the
  * right child's exprIds. Names must be unambiguous in each side's
  * output — enforced at construction.
  *
  * Tie rules (matching j11's window formulation): right time equal to
  * left time counts as prior; among equal-time right rows the last in
  * `(time, tieBreak…)` ascending order wins.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String,
    rightTieBreak: Seq[String]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** The node carries no Expressions, so the default (expression-derived)
    * references are empty — ColumnPruning would then prune the key/time
    * columns out of the children (observed: children pruned to exactly
    * the parent Project's needs). Declaring the consumed columns here —
    * resolved by NAME against the current children, so exprId rewrites
    * can't orphan them — keeps them alive while still letting Catalyst
    * prune every column neither the merge nor the parent needs: exactly
    * the pushdown behaviour a 100 TB as-of join wants. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    // guard: the parser path constructs this node over UNRESOLVED
    // relations, and analysis rules may ask for references before the
    // children resolve — `output` on an unresolved child throws
    if (!childrenResolved) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == leftKey || a.name == leftTime) ++
        right.output.filter(a => a.name == rightKey || a.name == rightTime ||
          rightTieBreak.contains(a.name)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical merge as-of join. Requires both children clustered on their
  * key and sorted by (key, time[, tieBreak…]); emits left rows in their
  * incoming order joined to the held latest-prior right row.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: String,
    leftTime: String,
    rightKey: String,
    rightTime: String,
    rightTieBreak: Seq[String]) extends BinaryExecNode {

  private def attrOf(side: SparkPlan, name: String): Attribute = {
    val hits = side.output.filter(_.name == name)
    require(hits.size == 1,
      s"as-of join column '$name' must match exactly one output column, " +
        s"got ${hits.size} in [${side.output.map(_.name).mkString(", ")}]")
    hits.head
  }
  private def lKeyAttr  = attrOf(left, leftKey)
  private def lTimeAttr = attrOf(left, leftTime)
  private def rKeyAttr  = attrOf(right, rightKey)
  private def rTimeAttr = attrOf(right, rightTime)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKeyAttr)) ::
      ClusteredDistribution(Seq(rKeyAttr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKeyAttr, Ascending), SortOrder(lTimeAttr, Ascending)),
    Seq(SortOrder(rKeyAttr, Ascending), SortOrder(rTimeAttr, Ascending)) ++
      rightTieBreak.map(n => SortOrder(attrOf(right, n), Ascending)))

  // left rows pass through 1:1 in partition order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Total ordering for the key/time types this engine joins on. SortExec
    * orders the runs; this ordering only has to AGREE with it on the
    * supported types (nulls are handled explicitly in the merge, never
    * compared here). */
  private def ordFor(dt: DataType, what: String): Ordering[Any] = (dt match {
    case LongType | TimestampType | TimestampNTZType => Ordering.Long
    case IntegerType | DateType => Ordering.Int
    case ShortType => Ordering.Short
    case StringType => Ordering.ordered[UTF8String]
    case other => throw new IllegalArgumentException(
      s"as-of join $what type $other not supported (need integral, " +
        "timestamp, date or string)")
  }).asInstanceOf[Ordering[Any]]

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd  = left.output.indexOf(lKeyAttr)
    val lTimeOrd = left.output.indexOf(lTimeAttr)
    val rKeyOrd  = right.output.indexOf(rKeyAttr)
    val rTimeOrd = right.output.indexOf(rTimeAttr)
    val keyType  = lKeyAttr.dataType
    val timeType = lTimeAttr.dataType
    require(rKeyAttr.dataType == keyType && rTimeAttr.dataType == timeType,
      s"as-of join key/time types must match across sides: " +
        s"($keyType, $timeType) vs (${rKeyAttr.dataType}, ${rTimeAttr.dataType})")
    val keyOrd  = ordFor(keyType, "key")
    val timeOrd = ordFor(timeType, "time")
    val outAttrs = output
    val leftAll  = left.output
    val rightWidth = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, leftAll ++ outAttrs.drop(leftAll.size))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      new Iterator[InternalRow] {
        // one-row lookahead; copied because scan/sort iterators reuse
        // their row buffer across next() calls
        private var rHead: InternalRow = null
        private var rHeadKey: Any = null
        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            // null keys and null times can never be "latest prior" —
            // drop them on read so the held state is always comparable
            if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTimeOrd)) {
              rHead = r.copy()
              rHeadKey = rHead.get(rKeyOrd, keyType)
            }
          }
        }
        advanceRight()

        // latest right row consumed so far whose (key, time) qualifies
        // for the CURRENT left key — O(1) merge state
        private var held: InternalRow = null
        private var heldKey: Any = null

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val matched: InternalRow =
            if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd)) null
            else {
              val lk = l.get(lKeyOrd, keyType)
              val lt = l.get(lTimeOrd, timeType)
              // consume right rows that are behind (smaller key) or
              // qualify (same key, time <= left time); the last
              // qualifying one consumed is the as-of match
              var scan = true
              while (scan && rHead != null) {
                val c = keyOrd.compare(rHeadKey, lk)
                if (c < 0) advanceRight()
                else if (c == 0 &&
                    timeOrd.compare(rHead.get(rTimeOrd, timeType), lt) <= 0) {
                  held = rHead; heldKey = rHeadKey
                  advanceRight()
                } else scan = false
              }
              if (held != null && keyOrd.compare(heldKey, lk) == 0) held
              else null
            }
          proj(joined(l, if (matched == null) nullRight else matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-to-one lowering of the logical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tb) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API over the custom node. */
object AsOfJoinOps {
  /** `left` gains the latest `right` row per `key` with
    * `right.timeRight <= left.timeLeft`; `tieBreak` columns order
    * equal-time right rows (last wins). Column names must be
    * unambiguous per side and distinct across sides in the result. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, leftTime: String,
               rightKey: String, rightTime: String,
               tieBreak: Seq[String] = Nil): DataFrame = {
    def planOf(df: DataFrame) = df.queryExecution.analyzed
    GraftColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(planOf(left), planOf(right),
        leftKey, leftTime, rightKey, rightTime, tieBreak))
  }
}
