package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{abs, col, lit}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator: equi-key + time-band join
  * (`a.k = b.k AND abs(a.t - b.t) <= delta`) — SURVEY's tier-(c)
  * extension path: LogicalPlan pattern → Strategy → SparkPlan.
  *
  * Why: Spark plans this shape as a hash join on the equi key with the
  * band as a *post-join filter*, materializing the full per-key cross
  * product first — O(g²) per key group. `BandJoinExec` asks for the same
  * hash clustering, sorts both sides by (key, time) (EnsureRequirements
  * inserts the exchanges/sorts), and then streams a sorted sweep with a
  * sliding window of right rows: O(g·log g + matches). At 100 TB with hot
  * keys, that asymptotic difference is the operator.
  *
  * Registration is `spark.experimental.extraStrategies` (public API, no
  * session rebuild needed); the strategy pattern-matches the natural join
  * condition, so the DataFrame code a user writes is unchanged — this is
  * purely a physical-planning improvement. Keys and times must be
  * LongType (epoch micros); anything else falls through to stock Spark.
  */
object BandJoin {

  /** Build the band join with the natural syntax; the strategy picks it
    * up at planning time. Column names must be disambiguated by the
    * caller (rename before joining — self-joins especially). */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String, delta: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[BandJoinStrategy.type])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BandJoinStrategy
    }
    left.join(right,
      col(leftKey) === col(rightKey) &&
        abs(col(leftTime) - col(rightTime)) <= lit(delta))
  }
}

object BandJoinStrategy extends SparkStrategy {

  /** Matches `lk = rk AND abs(lt - rt) <= delta` with all of lk/lt from
    * the left side, rk/rt from the right, everything LongType. */
  private def extract(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Attribute, Long)] = {
    def attrOf(e: Expression, side: LogicalPlan): Option[Attribute] = e match {
      case a: Attribute if side.outputSet.contains(a) && a.dataType == LongType => Some(a)
      case _ => None
    }
    cond match {
      case And(EqualTo(k1, k2), LessThanOrEqual(Abs(Subtract(t1, t2, _), _), Literal(d: Long, LongType))) =>
        for {
          lk <- attrOf(k1, left).orElse(attrOf(k2, left))
          rk <- attrOf(k1, right).orElse(attrOf(k2, right))
          lt <- attrOf(t1, left).orElse(attrOf(t2, left))
          rt <- attrOf(t1, right).orElse(attrOf(t2, right))
        } yield (lk, rk, lt, rt, d)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _) =>
      extract(cond, left, right) match {
        case Some((lk, rk, lt, rt, delta)) =>
          BandJoinExec(lk, rk, lt, rt, delta, planLater(left), planLater(right)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

case class BandJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    delta: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val d = delta
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joiner = new JoinedRow
        private val project = UnsafeProjection.create(out, out)
        private val rBuffered = rIter.buffered
        // sliding window of right rows for the current left key
        private val window = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        private var wIdx = 0
        private var current: InternalRow = _
        private var lk = 0L
        private var lt = 0L
        private var ready: InternalRow = _

        private def advanceLeft(): Boolean = {
          if (!lIter.hasNext) return false
          current = lIter.next()
          lk = current.getLong(lkOrd)
          lt = current.getLong(ltOrd)
          // ingest right rows: keys below lk are dead; same-key rows up to
          // lt + delta belong in the window
          while (rBuffered.hasNext && {
            val r = rBuffered.head
            val rk = r.getLong(rkOrd)
            rk < lk || (rk == lk && r.getLong(rtOrd) <= lt + d)
          }) {
            val r = rBuffered.next()
            if (r.getLong(rkOrd) == lk) window.append(r.copy())
          }
          // evict: stale keys (from a previous left key) and too-old times
          while (window.nonEmpty && (window.head.getLong(rkOrd) != lk ||
            window.head.getLong(rtOrd) < lt - d)) window.removeHead()
          wIdx = 0
          true
        }

        override def hasNext: Boolean = {
          while (ready == null) {
            if (current == null || wIdx >= window.length) {
              var progressed = advanceLeft()
              // skip left rows with no matches
              while (progressed && window.isEmpty) progressed = advanceLeft()
              if (!progressed) return false
            }
            // all windowed rows satisfy key == lk and lt-d <= rt <= lt+d
            val r = window(wIdx)
            wIdx += 1
            if (r.getLong(rtOrd) <= lt + d && r.getLong(rtOrd) >= lt - d) {
              ready = project(joiner(current, r))
            }
          }
          true
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = ready
          ready = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
