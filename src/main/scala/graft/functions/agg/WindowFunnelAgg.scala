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
    mode: Int = 0,
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
    if (mode != 0) return refModes(sorted, windowMicros)
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

  /** Reference mode semantics (window_funnel.h get_event_level):
    * mode bits — 1 deduplication (a level already reached repeats →
    * current chain dies), 2 fixed (a leap over an unreached level
    * after a chain started → chain dies), 4 increase (strictly
    * increasing timestamps between promotions). mode&3 == 0 with
    * increase runs the reference's default sliding-chain loop.
    * mode == 0 keeps this library's documented greedy (oracle-gated)
    * semantics — any nonzero mode follows the reference exactly. */
  private def refModes(sorted: ArrayBuffer[(Long, Int)], windowMicros: Long): Int = {
    val increase = (mode & 4) != 0
    val m = mode & 3
    val start = Array.fill(numSteps)(-1L)
    val last = Array.fill(numSteps)(-1L)
    var cur = -1 // max level of the live chain
    var maxLevel = -1 // best completed/dead chain
    def eliminate(): Unit = { while (cur >= 0) { start(cur) = -1L; cur -= 1 } }
    def retire(): Unit = { if (cur > maxLevel) maxLevel = cur; eliminate() }
    def promote(ts: Long, level: Int): Boolean = {
      val base = start(level - 1)
      var ok = ts <= base + windowMicros
      if (increase) ok = ok && last(level - 1) < ts
      if (ok) {
        start(level) = base; last(level) = ts
        if (level > cur) cur = level
        if (level + 1 == numSteps) return true
      }
      false
    }
    if (m == 0) {
      // reference default loop (only reachable with increase bit)
      for ((ts, level) <- sorted) {
        if (level == 0) { start(0) = ts; last(0) = ts }
        else if (start(level - 1) >= 0) {
          var ok = ts <= start(level - 1) + windowMicros
          if (increase) ok = ok && last(level - 1) < ts
          if (ok) {
            start(level) = start(level - 1); last(level) = ts
            if (level + 1 == numSteps) return numSteps
          }
        }
      }
      var lvl = numSteps
      while (lvl > 0 && start(lvl - 1) < 0) lvl -= 1
      return lvl
    }
    var firstEvent = false
    for ((ts, level) <- sorted) {
      if (level == 0) {
        // window_funnel.h leaves last_timestamp[0] = -1 here (only
        // promote_to_next_level sets last), so with the increase bit a
        // step-1 event at the SAME timestamp as step 0 still promotes.
        start(0) = ts
        if (cur < 0) cur = 0
        firstEvent = true
      } else if ((m & 1) != 0 && start(level) >= 0) {
        retire() // deduplication: an existing event recurs
      } else if ((m & 2) != 0 && firstEvent && start(level - 1) < 0) {
        if (cur >= 0) retire() // fixed: leap over an unreached level
      } else if (start(level - 1) >= 0) {
        if (promote(ts, level)) return numSteps
      }
    }
    math.max(cur, maxLevel) + 1
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
