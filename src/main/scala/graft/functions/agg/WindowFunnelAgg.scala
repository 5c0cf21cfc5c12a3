package graft.functions.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** window_funnel(window_seconds, ts, step) — max funnel depth reached.
  *
  * Reference: `be/src/exprs/agg/window_funnel.h:433` (StarRocks
  * window_funnel aggregate). Semantics implemented here (documented,
  * deterministic, SQL-mirrorable for the oracle): greedy chain —
  *   t0 = min ts of step-0 events;
  *   t_i = min ts of step-i events with ts > t_{i-1} and
  *         ts <= t0 + window.
  * Result = number of chained steps (0 if step 0 never fires).
  *
  * Input `step` is the 0-based step index of the event (-1/null = not
  * part of the funnel). Buffer holds (epochMicros, step) pairs — per
  * group-key cardinality is user-session sized, so the buffer stays
  * small even at 100 TB total scale (the heavy lifting is the shuffle,
  * which Spark handles).
  */
case class WindowFunnelAgg(
    windowExpr: Expression,
    tsExpr: Expression,
    stepExpr: Expression,
    numSteps: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  override def children: Seq[Expression] = Seq(windowExpr, tsExpr, stepExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "window_funnel"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)], input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val ts = tsExpr.eval(input)
    val st = stepExpr.eval(input)
    if (ts != null && st != null) {
      val step = st.asInstanceOf[Number].intValue()
      if (step >= 0 && step < numSteps) buf += ((ts.asInstanceOf[Long], step))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Int)], b: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    a ++= b; a
  }

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    if (buf.isEmpty) return 0
    val windowMicros = windowExpr.eval(InternalRow.empty).asInstanceOf[Number].longValue() * 1000000L
    val sorted = buf.sortBy(x => (x._1, x._2))
    // t0: earliest step-0 event
    var prev = Long.MinValue
    var deadline = Long.MaxValue
    var reached = 0
    var i = 0
    var targetStep = 0
    while (i < sorted.length && targetStep < numSteps) {
      val (ts, step) = sorted(i)
      if (ts > deadline) return reached
      if (step == targetStep && (targetStep == 0 || ts > prev)) {
        if (targetStep == 0) deadline = ts + windowMicros
        prev = ts
        reached += 1
        targetStep += 1
      }
      i += 1
    }
    reached
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (ts, st) => out.writeLong(ts); out.writeInt(st) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readInt())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(windowExpr = newChildren(0), tsExpr = newChildren(1), stepExpr = newChildren(2))
}
