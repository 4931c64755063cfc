package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator form of the canonical
  * time-series enrichment join (pandas `merge_asof`, kdb `aj`) that
  * relational algebra only reaches via a window over a unioned stream
  * (q16/q99's shape) or an exploding range join. Two directions:
  *
  *  - BACKWARD (q175): for each left row, the LAST right row with the
  *    same key and ts <= left ts (within `tolUs`); right ties on
  *    (key, ts) break toward the greatest `rightTiebreak`.
  *  - NEAREST (q183): for each left row, the nearest right row within
  *    ±`tolUs`, ties toward the backward candidate — pandas
  *    `merge_asof(direction='nearest')`. Predecessor/successor are
  *    defined by LEXICOGRAPHIC (ts, tiebreak) interleaving, so a right
  *    row at the exact left timestamp counts backward iff its tiebreak
  *    is smaller — exactly the unioned-window formulation q99 runs,
  *    which is what lets both surfaces share one oracle.
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
  * single forward pass per partition holding ONE buffered right row per
  * direction: no per-key buffering, no window state, skew-safe by
  * construction.
  *
  * Scope: keys, timestamps and tiebreaks are LongType (the engine's
  * ts_us convention).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        rightTiebreak: Attribute,
                        tolUs: Long,
                        nearest: Boolean = false,
                        leftTiebreak: Option[Attribute] = None) extends BinaryNode {
  // nearest-mode interleaving reads the left tiebreak per row; fail at
  // plan construction, not as an isNullAt(-1) inside doExecute
  require(!nearest || leftTiebreak.isDefined,
    "AsOfJoinPlan: nearest=true requires leftTiebreak")
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
        j.rightTiebreak, j.tolUs, j.nearest, j.leftTiebreak,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children arrive hash-clustered on key and sorted
  * by (key, ts[, tiebreak]) — demanded declaratively below, satisfied by
  * EnsureRequirements — then one streaming merge pass per co-partition.
  * State per partition is a single copied right row (the current best
  * predecessor) plus, in nearest mode, the un-consumed lookahead row
  * (which IS the successor candidate), so memory is O(1) whatever the
  * key skew.
  */
case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute,
                        rightTiebreak: Attribute, tolUs: Long,
                        nearest: Boolean, leftTiebreak: Option[Attribute],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ++
      (if (nearest) leftTiebreak.map(SortOrder(_, Ascending)).toSeq else Nil),
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
    val ltbOrd = leftTiebreak.map(a => left.output.indexWhere(_.exprId == a.exprId)).getOrElse(-1)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rtbOrd = right.output.indexWhere(_.exprId == rightTiebreak.exprId)
    val nRight = right.output.size
    val tol = tolUs
    val near = nearest
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
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd) ||
            (near && l.isNullAt(ltbOrd))) {
          // null key/ts (or null nearest-tiebreak) never matches
          // (join-key semantics); nulls sort first, so no right progress
          // is lost by not advancing
          proj(joined(l, nullRight))
        } else {
          val lk = l.getLong(lkOrd)
          val lts = l.getLong(ltOrd)
          val ltb = if (near) l.getLong(ltbOrd) else 0L
          if (haveHeld && heldKey < lk) haveHeld = false
          var continue = true
          while (continue) {
            if (rRow == null && rit.hasNext) rRow = rit.next()
            if (rRow == null) continue = false
            else if (rRow.isNullAt(rkOrd) || rRow.isNullAt(rtOrd) ||
                     (near && rRow.isNullAt(rtbOrd))) rRow = null // unmatched by definition
            else {
              val rk = rRow.getLong(rkOrd)
              val rts = rRow.getLong(rtOrd)
              // backward: consume while rts <= lts (inclusive — every
              // same-ts right row is a predecessor, later tiebreaks
              // overwrite). nearest: consume while (rts, rtb) < (lts, ltb)
              // lexicographically — a same-ts right row with a GREATER
              // tiebreak stays ahead as the successor candidate.
              val consume =
                if (rk < lk) true
                else if (rk > lk) false
                else if (!near) rts <= lts
                else rts < lts || (rts == lts && rRow.getLong(rtbOrd) < ltb)
              if (consume) {
                if (rk == lk) {
                  // later rows in (ts, tiebreak) order overwrite: "last
                  // predecessor, ties to greatest tiebreak"
                  held = rRow.copy(); heldKey = rk; heldTs = rts; haveHeld = true
                }
                rRow = null
              } else continue = false
            }
          }
          val predOk = haveHeld && heldKey == lk && lts - heldTs <= tol
          if (!near) {
            if (predOk) proj(joined(l, held))
            else proj(joined(l, nullRight))
          } else {
            // rRow is the first right row past (lts, ltb) in this key's
            // run (or a later key / exhausted): the successor candidate
            var succOk = false
            var succTs = 0L
            if (rRow != null && !rRow.isNullAt(rkOrd) && !rRow.isNullAt(rtOrd) &&
                rRow.getLong(rkOrd) == lk) {
              succTs = rRow.getLong(rtOrd)
              succOk = succTs - lts <= tol
            }
            // ties toward backward: at equal distance the predecessor wins
            if (predOk && (!succOk || lts - heldTs <= succTs - lts)) proj(joined(l, held))
            else if (succOk) proj(joined(l, rRow))
            else proj(joined(l, nullRight))
          }
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
                   rightTiebreak: String, tolUs: Long): DataFrame =
    build(left, right, leftKey, leftTs, None, rightKey, rightTs,
      rightTiebreak, tolUs, nearest = false)

  /** Nearest-direction as-of with tolerance: per left row, the right row
    * minimizing |Δts| within ±`tolUs`, equal distance to the backward
    * side; predecessor/successor split by (ts, tiebreak) lexicographic
    * interleaving (see [[AsOfJoinPlan]]). `leftTiebreak` orders left rows
    * against same-timestamp right rows — pass the row's unique id.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTs: String, leftTiebreak: String,
                  rightKey: String, rightTs: String,
                  rightTiebreak: String, tolUs: Long): DataFrame =
    build(left, right, leftKey, leftTs, Some(leftTiebreak), rightKey, rightTs,
      rightTiebreak, tolUs, nearest = true)

  private def build(left: DataFrame, right: DataFrame,
                    leftKey: String, leftTs: String, leftTiebreak: Option[String],
                    rightKey: String, rightTs: String,
                    rightTiebreak: String, tolUs: Long,
                    nearest: Boolean): DataFrame = {
    val what = if (nearest) "asofNearest" else "asofBackward"
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"$what: no column '$n' on the $side side"))
    def long(a: Attribute): Attribute = {
      require(a.dataType == LongType,
        s"$what key/ts/tiebreak must be BIGINT, got ${a.dataType} for ${a.name}")
      a
    }
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      s"$what: rename right-side columns first — outputs concatenate")
    // the merge's `lts - heldTs <= tol` check assumes a non-negative
    // tolerance; a negative one would silently produce an all-null right
    // side rather than an error
    require(tolUs >= 0, s"$what: tolUs must be >= 0, got $tolUs")
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      long(attr(lp, leftKey, "left")), long(attr(lp, leftTs, "left")),
      long(attr(rp, rightKey, "right")), long(attr(rp, rightTs, "right")),
      long(attr(rp, rightTiebreak, "right")), tolUs,
      nearest, leftTiebreak.map(n => long(attr(lp, n, "left")))))
  }
}
