package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken toward the smaller id) per group.
  *
  * The window formulation (`row_number over (partition by q order by
  * score desc)`) must shuffle and sort the *entire* scored relation —
  * at ANN scale that is Q·N rows. This aggregate is partial-aggregable:
  * each map task keeps at most k pairs per group, so the shuffle
  * carries ≤ k·groups rows and nothing is ever fully sorted. This is
  * the Spark-idiomatic custom operator for "top-k per key"
  * (SURVEY.md §2.9: custom Aggregator where collect_list blow-up
  * matters at scale).
  *
  * Buffer: a min-at-head priority queue of (score, id); eval emits an
  * array<struct<score, id>> sorted best-first — deterministic for any
  * input order.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // worst pair ranks greatest => sits at the queue head for eviction
  private val worstFirst: Ordering[(Double, Long)] = (x, y) => {
    val c = java.lang.Double.compare(y._1, x._1)
    if (c != 0) c else java.lang.Long.compare(x._2, y._2)
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by worstFirst = best first (best compares smallest)
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {
  /** Column API: array of the k best (score, id) pairs, best first. */
  def top_k_pairs(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairs(
      ColumnBridge.expression(score.cast(DoubleType)),
      ColumnBridge.expression(id.cast(LongType)), k).toAggregateExpression())
}
