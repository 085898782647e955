package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native partial aggregate —
  * the bounded-memory alternative to an exact token groupBy when only
  * the frequent items matter (skew detection, stop-list mining,
  * streaming vocabularies). An exact global count is itself scalable
  * (CorpusStats.vocabulary), but its shuffle carries EVERY distinct
  * token; this summary's shuffle carries at most `capacity` entries
  * per map partition, a constant, and the driver/final merge holds one
  * bounded map — the single-pass form a stream can maintain.
  *
  * Contract (Misra & Gries 1982; mergeability per Agarwal et al. 2013,
  * "Mergeable Summaries"): with capacity k over N total tokens,
  *
  *   - every item with true count > N/(k+1) is PRESENT in the summary;
  *   - for every reported item, true − N/(k+1) ≤ estimate ≤ true.
  *
  * Both properties are machine-checked by the t66 gate (Verify fails
  * the round on violation), which is what justifies the sketch's
  * rows-only driver record.
  *
  * Update: classic MG — increment a tracked item, insert while under
  * capacity, otherwise decrement ALL counters by one (dropping zeros;
  * the arriving item is not inserted). The decrement is O(capacity)
  * but amortized O(1): each decrement pays for an earlier increment.
  * Merge: sum counters; if over capacity, subtract the (k+1)-th
  * largest count from every entry and drop the non-positive — the
  * reduction that keeps the error bound additive across partitions.
  *
  * Input: ARRAY<STRING> (a document's token array — no explode, no
  * per-token rows). Output: ARRAY<STRUCT<token STRING, est BIGINT>>
  * sorted estimate-descending then token-ascending (deterministic).
  */
case class MisraGriesTokens(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
                   StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], tok: String): Unit =
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1)
      case None if buf.size < capacity => buf.update(tok, 1L)
      case None =>
        // decrement-all (incoming item included, i.e. not inserted)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { k =>
          val c = buf(k) - 1
          if (c == 0) dead += k else buf.update(k, c)
        }
        dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) offer(buf, a.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) =>
      buf.update(k, buf.getOrElse(k, 0L) + v)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the ACHK'13 mergeable-summary reduction
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, v) =>
      (k.getBytes(StandardCharsets.UTF_8), v)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, v) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

object HeavyHitterFunctions {
  import ColumnOps._
  /** `misra_gries(tokens, k)` — ARRAY<STRUCT<token, est>> bounded
    * frequent-items summary over token arrays, estimate-descending.
    */
  def misra_gries(tokens: Column, capacity: Int): Column =
    toColumn(MisraGriesTokens(toExpr(tokens), capacity)
      .toAggregateExpression())
}
