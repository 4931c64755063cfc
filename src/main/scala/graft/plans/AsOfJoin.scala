package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native backward as-of join — the whole-operator form of "for each left
  * row, the LAST right row with the same key and ts <= left ts (within
  * `tolUs`)": the canonical time-series enrichment join (pandas
  * `merge_asof`, kdb `aj`) that relational algebra only reaches via a
  * window over a unioned stream (q16/q99's shape) or an exploding range
  * join.
  *
  * This is the SURVEY's preference tier (c) exercised for real: a custom
  * `LogicalPlan` node, a `SparkStrategy` planning it to a custom
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * (`GraftExtensions.injectPlannerStrategy`). The payoff over the window
  * composition is structural, not micro: the window form must UNION both
  * streams into one shuffle and sort the combined volume, while this
  * operator declares `ClusteredDistribution`/`SortOrder` requirements per
  * CHILD, so Catalyst's EnsureRequirements plans one exchange per side
  * (or none, if an upstream shuffle/bucketing already satisfies it — the
  * exact machinery sort-merge join rides), and the merge itself is a
  * single forward pass per partition holding ONE buffered right row: no
  * per-key buffering, no window state, skew-safe by construction.
  *
  * Scope: keys and timestamps are LongType (the engine's ts_us
  * convention); right-side ties on (key, ts) break toward the greatest
  * `rightTiebreak` — determinism the bare sort cannot give when payloads
  * differ at equal timestamps.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        rightTiebreak: Attribute,
                        tolUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs,
        j.rightTiebreak, j.tolUs, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: children arrive hash-clustered on key
  * and sorted by (key, ts[, tiebreak]) — demanded declaratively below,
  * satisfied by EnsureRequirements — then one streaming merge pass per
  * co-partition. State per partition is a single copied right row (the
  * current best predecessor), so memory is O(1) whatever the key skew.
  */
case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        rightTiebreak: Attribute, tolUs: Long,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTiebreak, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val nRight = right.output.size
    val tol = tolUs
    val outAttrs = output
    val childAttrs = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val proj = UnsafeProjection.create(outAttrs, childAttrs)
      // lookahead right row: valid until the NEXT rit.next() call, so it
      // is consumed (or copied into `held`) before advancing
      var rRow: InternalRow = null
      var held: InternalRow = null
      var heldKey = 0L
      var heldTs = 0L
      var haveHeld = false
      lit.map { l =>
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
          // null key/ts never matches (join-key semantics); nulls sort
          // first, so no right progress is lost by not advancing
          proj(joined(l, nullRight))
        } else {
          val lk = l.getLong(lkOrd)
          val lts = l.getLong(ltOrd)
          if (haveHeld && heldKey < lk) haveHeld = false
          var continue = true
          while (continue) {
            if (rRow == null && rit.hasNext) rRow = rit.next()
            if (rRow == null) continue = false
            else if (rRow.isNullAt(rkOrd) || rRow.isNullAt(rtOrd)) rRow = null // unmatched by definition
            else {
              val rk = rRow.getLong(rkOrd)
              val rts = rRow.getLong(rtOrd)
              if (rk < lk || (rk == lk && rts <= lts)) {
                if (rk == lk) {
                  // later rows in (ts, tiebreak) order overwrite: "last
                  // predecessor, ties to greatest tiebreak"
                  held = rRow.copy(); heldKey = rk; heldTs = rts; haveHeld = true
                }
                rRow = null
              } else continue = false
            }
          }
          if (haveHeld && heldKey == lk && lts - heldTs <= tol) proj(joined(l, held))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}

/** Public construction API: builds the resolved plan node directly from
  * the two frames' analyzed plans (attributes are resolved by NAME here,
  * once, so the node enters the analyzer already resolved and only the
  * injected Strategy is needed — no custom resolution rule).
  */
object AsOf {
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, leftTs: String,
                   rightKey: String, rightTs: String,
                   rightTiebreak: String, tolUs: Long): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asofBackward: no column '$n' on the $side side"))
    def long(a: Attribute): Attribute = {
      require(a.dataType == LongType,
        s"asofBackward key/ts/tiebreak must be BIGINT, got ${a.dataType} for ${a.name}")
      a
    }
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "asofBackward: rename right-side columns first — outputs concatenate")
    // the merge's `lts - heldTs <= tol` check assumes a non-negative
    // tolerance; a negative one would silently produce an all-null right
    // side rather than an error
    require(tolUs >= 0, s"asofBackward: tolUs must be >= 0, got $tolUs")
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      long(attr(lp, leftKey, "left")), long(attr(lp, leftTs, "left")),
      long(attr(rp, rightKey, "right")), long(attr(rp, rightTs, "right")),
      long(attr(rp, rightTiebreak, "right")), tolUs))
  }
}
