package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken by smallest id), as a native partial
  * aggregate.
  *
  * This is the scale-correct replacement for the classic
  * `row_number().over(Window.partitionBy(qid).orderBy(desc(score)))`
  * top-k: the window form exchanges EVERY scored row and funnels each
  * qid's entire candidate set through one task, while this aggregate
  * reduces map-side — each map partition contributes at most k entries
  * per group to the shuffle, so shuffle volume is
  * O(partitions · groups · k) regardless of corpus size, and the final
  * per-group merge touches only those survivors.
  *
  * Buffer: a worst-first bounded heap (O(log k) insert). Output:
  * ARRAY<STRUCT<score DOUBLE, id BIGINT>> sorted best-first —
  * deterministic for any input order, so downstream posexplode yields
  * the same (rank, id, score) rows the window form produced.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")

  /** Declared input types: SQL-surface calls with e.g. an INT score or
    * id implicitly cast instead of dying with a ClassCastException in
    * update() on the executors.
    */
  override def inputTypes = Seq(DoubleType, LongType)

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  /** PriorityQueue dequeues its greatest element; order it so the
    * "greatest" is the WORST kept pair (lowest score, then largest id)
    * — one dequeue after each over-capacity insert restores the bound.
    * Scores compare via java.lang.Double.compare so NaN ranks as the
    * GREATEST score (= best, kept), exactly matching the descending
    * row_number window this aggregate replaces (Spark sorts NaN above
    * every double); an Ordering.by(-score) would negate NaN into the
    * worst slot and silently drop zero-norm-cosine rows.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // higher score = less worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending in worstFirst = least-worst first = best-first, NaN-safe
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(score = l, id = r)
}

/** [[TopKByScore]] with exact-DUPLICATE-pair suppression: a
  * (score, id) pair already in the buffer is skipped instead of
  * occupying a second slot. For scores that are a deterministic
  * function of the id (the seeded-uniform sampling convention), pair
  * dedup IS id dedup — which makes this the streaming-state form of
  * `dropDuplicates + top-k`: ONE stateful operator whose per-window
  * state is k pairs, instead of chaining a streaming dedup into a
  * windowed aggregation (two stateful operators and unbounded dedup
  * state). Same bounded heap, ordering, merge, and output contract as
  * [[TopKByScore]]; the TreeSet buffer adds pair-membership lookup.
  */
case class TopKDistinctByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(Double, Long)]]
    with BinaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(k >= 1, "k must be >= 1")

  override def inputTypes = Seq(DoubleType, LongType)
  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  /** Best-first total order (the inverse of TopKByScore's worst-first
    * heap order): highest score first, NaN greatest, smallest id on
    * ties — so `buf.last` is the worst kept pair. */
  private val bestFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Double, Long)] =
    mutable.TreeSet.empty(bestFirst)

  private def offer(buf: mutable.TreeSet[(Double, Long)],
                    e: (Double, Long)): Unit = {
    if (buf.add(e) && buf.size > k) buf.remove(buf.last)
  }

  override def update(buf: mutable.TreeSet[(Double, Long)],
                      input: InternalRow): mutable.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.TreeSet[(Double, Long)],
                     other: mutable.TreeSet[(Double, Long)]): mutable.TreeSet[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.map(p => InternalRow(p._1, p._2)))

  override def serialize(buf: mutable.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKDistinctByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKDistinctByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(score = l, id = r)
}

object TopKFunctions {
  import ColumnOps._

  /** The shared guard for every consumer of the (double, long) heap
    * aggregates: a non-integral id would cast to NULL and be silently
    * skipped by update(), emptying the result with no error. One
    * definition — Buckets.capped, Similarity.topKPerQuery, and the
    * Sampling operators all route here.
    */
  def requireIntegralId(t: DataType, context: String): Unit =
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(t),
      s"$context requires an integral id column (the bounded heap " +
        s"stores (double, long) pairs), got $t")
  /** `top_k_by_score(score, id, k)` — ARRAY<STRUCT<score,id>> of the k
    * highest-score pairs, best-first, smallest-id tiebreak.
    */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    toColumn(TopKByScore(toExpr(score), toExpr(id), k).toAggregateExpression())

  /** [[top_k_by_score]] with exact-duplicate-pair suppression — the
    * distinct-key form usable directly in streaming aggregation state.
    */
  def top_k_distinct_by_score(score: Column, id: Column, k: Int): Column =
    toColumn(TopKDistinctByScore(toExpr(score), toExpr(id), k)
      .toAggregateExpression())
}
