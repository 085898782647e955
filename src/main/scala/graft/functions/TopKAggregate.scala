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

object TopKFunctions {
  import ColumnOps._
  /** `top_k_by_score(score, id, k)` — ARRAY<STRUCT<score,id>> of the k
    * highest-score pairs, best-first, smallest-id tiebreak.
    */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    toColumn(TopKByScore(toExpr(score), toExpr(id), k).toAggregateExpression())
}
