package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Native backward as-of join — the full custom-operator stack (logical
  * node → planner strategy → physical sort-merge exec) for the ONE
  * operator in the surface where composition provably over-pays at scale.
  *
  * [[graft.relational.AsOfJoin]] composes the same semantics from
  * union+window: one shuffle of |L|+|R| rows — but every RIGHT row in that
  * union is padded with NULLs for the full LEFT schema (and vice versa for
  * the carried struct), so a wide probe side ships its width × |R| in
  * padding through the exchange, and the window operator buffers each
  * (key, time)-sorted partition twice (sort + frame evaluation). This exec
  * shuffles each side AT ITS OWN WIDTH (ClusteredDistribution on the keys,
  * the exact SortMergeJoin contract), sorts each side by (keys, time), and
  * streams ONE forward merge pass per partition carrying a single
  * right-row buffer — no padding, no window state, no second pass.
  *
  * Semantics (bit-identical to [[graft.relational.AsOfJoin.backward]] and
  * DuckDB `ASOF JOIN ... ON l.t >= r.t`): for each left row, the LATEST
  * right row with equal keys and right.time <= left.time (ties visible);
  * no match → NULL-filled carried columns (left-join shape). Among right
  * rows sharing (keys, time), the last in sort order wins — callers needing
  * determinism there must ensure (keys, time) uniqueness, same as the
  * compositional form. NULL time columns follow DuckDB too: a null-time
  * right row never matches (filtered at build), a null-time left row is
  * emitted unmatched.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    carried: Seq[Attribute], asofAttrs: Seq[Attribute],
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofAttrs
  // the asof_* columns are born here: excluded from missing-input analysis
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    carried: Seq[Attribute], asofAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  // the SortMergeJoin contract: co-partition on the equi-keys, sort each
  // side by (keys, time) — EnsureRequirements inserts the exchanges/sorts,
  // AQE coalesces/skew-splits them exactly as it would a SMJ
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys.map(_.asInstanceOf[Expression]), lOut)
        val rKeyProj = UnsafeProjection.create(rightKeys.map(_.asInstanceOf[Expression]), rOut)
        val carriedProj = UnsafeProjection.create(carried.map(_.asInstanceOf[Expression]), rOut)
        val lTimeBound = BindReferences.bindReference(leftTime.asInstanceOf[Expression], lOut)
        val rTimeBound = BindReferences.bindReference(rightTime.asInstanceOf[Expression], rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
        val result = UnsafeProjection.create(output.map(_.asInstanceOf[Expression]), output)
        val joined = new JoinedRow
        val nulls = new GenericInternalRow(carried.length)

        // NULL-time semantics follow DuckDB ASOF (l.t >= r.t is NULL on
        // NULL ⇒ never a match): null-time RIGHT rows are filtered out at
        // build(); null-time LEFT rows emit unmatched below. timeOf's
        // -inf mapping only remains as a defensive consistency with the
        // nulls-first sort order should the exec be constructed directly.
        def timeOf(e: Expression, row: InternalRow): Long = e.eval(row) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
          case null => Long.MinValue
          case other => throw new IllegalStateException(
            s"unsupported as-of time value class ${other.getClass}")
        }
        // boxed variant for the left side: null must be DISTINGUISHED (no
        // match), not collapsed into -inf
        def timeOrNull(e: Expression, row: InternalRow): java.lang.Long =
          e.eval(row) match {
            case l: java.lang.Long => l
            case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
            case null => null
            case other => throw new IllegalStateException(
              s"unsupported as-of time value class ${other.getClass}")
          }

        var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        var carryKey: UnsafeRow = null
        var carryVals: UnsafeRow = null

        if (forward) {
          // nearest right at-or-AFTER: rights with rt < lT are dead for
          // every later left row too (lT ascending within the key), so the
          // pointer is monotone and the match is simply the right head.
          // Rights are consumed only once the key group or time passes —
          // a left row's match may serve later left rows as well, so the
          // head is NOT advanced past a satisfying row.
          lIter.map { lRow =>
            val lKey = lKeyProj(lRow)
            val lTBox = timeOrNull(lTimeBound, lRow)
            if (lTBox == null) {
              // null-time left: no match, and (nulls-first sort) it precedes
              // every timed row of its key, so skipping the merge keeps the
              // pointer monotone for later rows
              numOutputRows += 1
              result(joined(lRow, nulls))
            } else {
              val lT = lTBox.longValue
              var advancing = true
              while (advancing && rRow != null) {
                val rKey = rKeyProj(rRow)
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0 || (cmp == 0 && timeOf(rTimeBound, rRow) < lT)) {
                  rRow = if (rIter.hasNext) rIter.next() else null
                } else {
                  advancing = false
                }
              }
              val matched = rRow != null && keyOrd.compare(rKeyProj(rRow), lKey) == 0
              if (matched) numMatched += 1
              numOutputRows += 1
              result(joined(lRow, if (matched) carriedProj(rRow) else nulls))
            }
          }
        } else lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lTBox = timeOrNull(lTimeBound, lRow)
          if (lTBox == null) {
            numOutputRows += 1
            result(joined(lRow, nulls))
          } else {
            val lT = lTBox.longValue
            var advancing = true
            while (advancing && rRow != null) {
              val rKey = rKeyProj(rRow)
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) {
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (cmp == 0 && timeOf(rTimeBound, rRow) <= lT) {
                carryKey = rKey.copy()
                carryVals = carriedProj(rRow).copy()
                rRow = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            }
            val matched = carryKey != null && keyOrd.compare(carryKey, lKey) == 0
            if (matched) numMatched += 1
            numOutputRows += 1
            result(joined(lRow, if (matched) carryVals else nulls))
          }
        }
    }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.carried, n.asofAttrs, n.forward,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level builder for the native exec. */
object NativeAsOf {

  private val supportedTime: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)

  def register(spark: SparkSession): Unit =
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)

  /** Native backward as-of: `left` columns + `asof_<c>` for each carried
    * right column. Same semantics as [[graft.relational.AsOfJoin.backward]].
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame =
    build(left, right, keyCols, leftTime, rightTime, rightVals, forward = false)

  /** Native forward as-of (nearest right at-or-AFTER) — mergeable in the
    * same ascending order: dead rights stay dead for later left rows, so
    * the pointer is monotone and no carry buffer is needed. Same semantics
    * as [[graft.relational.AsOfJoin.forward]].
    */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTime: String, rightTime: String,
              rightVals: Seq[String]): DataFrame =
    build(left, right, keyCols, leftTime, rightTime, rightVals, forward = true)

  private def build(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    leftTime: String, rightTime: String,
                    rightVals: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right: self-joins (both sides carved from one
    // table) would otherwise alias attributes across the two children
    val rBase = right.queryExecution.analyzed
    val rAliases = rBase.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rBase)
    val rAttrs = rAliases.map(_.toAttribute)

    def la(n: String): Attribute = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left column not found: $n"))
    def ra(n: String): Attribute = rAttrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"right column not found: $n"))

    require(supportedTime.contains(la(leftTime).dataType) &&
      supportedTime.contains(ra(rightTime).dataType),
      "as-of time columns must be timestamp/date/integral")
    require(la(leftTime).dataType == ra(rightTime).dataType,
      s"as-of time types must match: ${la(leftTime).dataType} vs " +
        s"${ra(rightTime).dataType} (a long-vs-timestamp merge would compare " +
        "epoch micros against raw longs)")
    keyCols.foreach { kc =>
      require(la(kc).dataType == ra(kc).dataType,
        s"as-of key '$kc' types must match: ${la(kc).dataType} vs ${ra(kc).dataType}")
    }
    require(!left.columns.exists(c => rightVals.contains(c.stripPrefix("asof_"))
        && c.startsWith("asof_")),
      "left side already carries asof_-prefixed columns that would collide")
    val carried = rightVals.map(ra)
    val asofAttrs = carried.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    // DuckDB ASOF semantics on NULL: `l.t >= r.t` is NULL ⇒ never a match,
    // so a null-time right row is dead weight — drop it before the shuffle
    // (the exec handles null-time LEFT rows by emitting them unmatched)
    val rFiltered =
      if (ra(rightTime).nullable) Filter(IsNotNull(ra(rightTime)), rPlan)
      else rPlan
    GraftBridge.ofRows(spark, AsOfJoinNode(
      keyCols.map(la), keyCols.map(ra), la(leftTime), ra(rightTime),
      carried, asofAttrs, forward, lPlan, rFiltered))
  }
}
