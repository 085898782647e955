package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator extension surface (build-spec preference (c)): a
  * backward AS-OF JOIN as a first-class plan — custom logical node,
  * planner strategy, and physical sort-merge operator.
  *
  * The composed form (graft.ops.AsOfJoin: union + last(ignoreNulls)
  * window) is semantically complete but materializes a unioned row set
  * carrying BOTH sides' columns (each side padded with nulls for the
  * other's) through the shuffle and window. The native operator
  * declares what it actually needs — children clustered by key and
  * sorted by (key, ts) — and Catalyst's EnsureRequirements inserts the
  * exchanges/sorts; each partition then merges the two sorted runs in
  * one pass with O(1) state (the latest right row for the current
  * key). Neither side is padded, nothing is unioned, and the right
  * side ships only (key, ts, values).
  *
  * Scale shape: one hash exchange per side on the key (identical to
  * any equi-join), in-partition sort, streaming merge — the plan a
  * purpose-built time-series engine would run. At 100 TB the win over
  * the composed form is the halved shuffle width and the absence of
  * window state.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    valueAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan) = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.rightKey, n.leftTs, n.rightTs, n.valueAttrs) :: Nil
    case _ => Nil
  }

  /** Register on a live session (mirrors GraftExtensions.install). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
}

/** Physical backward as-of: children arrive clustered by key and
  * sorted by (key, ts) — guaranteed by requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements plants the exchanges —
  * and each co-partition pair merges in a single pass. For every left
  * row the operator emits the latest right row of the same key with
  * right.ts <= left.ts (inclusive, matching DuckDB ASOF `>=`), or
  * nulls (left-join semantics). Keys must be LongType, timestamps
  * Timestamp/LongType; the public wrapper normalizes.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    valueAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))
  override def outputPartitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val rOutput = right.output
    val values = valueAttrs
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val valueProj = UnsafeProjection.create(values, rOutput)
      val nullValues = new GenericInternalRow(values.length)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      new Iterator[InternalRow] {
        private var candidate: InternalRow = _ // copied latest right row
        private var candidateKey: Long = _
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val lRow = lIt.next()
          val lk = lKeyB.eval(lRow)
          val lt = lTsB.eval(lRow)
          if (lk == null || lt == null) return joined(lRow, nullValues)
          val lKey = lk.asInstanceOf[Long]
          val lTime = lt.asInstanceOf[Long]
          // consume right rows that can no longer match a future left
          // row better than they match this one: key strictly behind,
          // or same key with ts <= this left ts (left ts grows within
          // a key, so the last such row is this row's match and still
          // a candidate for later rows of the key)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTsB.eval(head)
            if (rk == null || rt == null) rBuf.next() // unmatchable
            else {
              val rKey = rk.asInstanceOf[Long]
              val rTime = rt.asInstanceOf[Long]
              if (rKey < lKey) rBuf.next()
              else if (rKey == lKey && rTime <= lTime) {
                candidate = rBuf.next().copy() // buffer outlives iterator reuse
                candidateKey = rKey
              } else advancing = false
            }
          }
          if (candidate != null && candidateKey == lKey)
            joined(lRow, valueProj(candidate))
          else joined(lRow, nullValues)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan) =
    copy(left = l, right = r)
}

/** Public API for the native as-of join. */
object NativeAsOfJoin {

  /** Backward as-of join via the custom operator: for each left row,
    * the latest `valueCols` from `right` with right ts <= left ts on
    * the same key. Output = left columns + `asof_<valueCol>` columns
    * (null when no prior right row) — the same contract as the
    * composed `graft.ops.AsOfJoin.backward`.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    // the merge kernel is long-keyed; a string key would ANSI-throw in
    // the cast below at runtime — reject it at build time instead
    // (hashing the key is NOT an option: a 64-bit hash collision would
    // silently merge distinct keys). Non-integral keys → the composed
    // graft.ops.AsOfJoin, which is key-type generic.
    Seq(left, right).foreach { df =>
      val t = df.schema(key).dataType
      require(Seq[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(t),
        s"native as-of join requires an integral key, got $t for '$key' — " +
        "use graft.ops.AsOfJoin.backward for other key types")
    }
    AsOfJoinStrategy.install(spark)
    def tsNorm(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType | LongType => col(c)
      case _ => col(c).cast("long")
    }
    // fresh right-side projection: the aliases mint new ExprIds, so a
    // self-as-of (left and right derived from one relation) cannot
    // alias-collide inside the custom node (it bypasses the analyzer's
    // join deduplication)
    val l = left.withColumn("__asof_lk", col(key).cast("long"))
      .withColumn("__asof_lt", tsNorm(left, leftTs))
    val r = right.select(
      col(key).cast("long").as("__asof_rk") +:
      tsNorm(right, rightTs).as("__asof_rt") +:
      valueCols.map(c => col(c).as(s"__asof_v_$c")): _*)
    def attr(df: DataFrame, n: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"missing column $n"))
    val node = AsOfJoinNode(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      attr(l, "__asof_lk"), attr(r, "__asof_rk"),
      attr(l, "__asof_lt"), attr(r, "__asof_rt"),
      valueCols.map(c => attr(r, s"__asof_v_$c")))
    org.apache.spark.sql.graftshim.Bridge.ofRows(spark, node)
      .select(left.columns.map(col).toIndexedSeq ++
              valueCols.map(c => col(s"__asof_v_$c").as(s"asof_$c")): _*)
  }
}
