package graft.functions.agg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, DeclarativeAggregate, ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Generic agg-state combinators — the reference's
  * `be/src/exprs/agg/combinator/` (`xxx_state` / `xxx_union` /
  * `xxx_merge`, typed by `be/src/types/agg_state_desc.h`): lift ANY
  * registered aggregate into a storable/mergeable partial state so an
  * AGG-keys table can hold intermediate states of arbitrary
  * aggregates, not just the hand-picked sketch types.
  *
  * Spark-first shape: one wrapper [[TypedImperativeAggregate]] drives
  * the inner aggregate's own partial-aggregation lifecycle, uniformly
  * over all three Catalyst aggregate flavors —
  *  - [[TypedImperativeAggregate]] (the engine's sketch kernels):
  *    driven directly through create/update/merge/serialize;
  *  - [[DeclarativeAggregate]] (sum/avg/min/max/corr/…): the buffer is
  *    the agg's own buffer row; update/merge run the agg's
  *    update/mergeExpressions via interpreted projections over
  *    JoinedRow(buffer, input) — exactly what AggregationIterator does
  *    inside HashAggregateExec, re-expressed so the buffer is OURS to
  *    serialize (UnsafeRow bytes);
  *  - raw [[ImperativeAggregate]] (approx_count_distinct's HLL++):
  *    re-offset to 0 and driven on a standalone buffer row.
  *
  * SQL surface (function name is a literal, mirroring the reference's
  * name-mangled combinators):
  *  - `agg_state('f', args…)`          → BINARY partial state
  *  - `agg_state_union('f', state, witness…)` → BINARY merged state
  *  - `agg_state_merge('f', state, witness…)` → final value
  * `witness…` are type witnesses (e.g. `CAST(NULL AS DOUBLE)`) that
  * reconstruct the inner aggregate's argument types for union/merge —
  * the role `agg_state_desc` plays in the reference; they are never
  * evaluated (replaced by typed null literals before execution).
  *
  * Scale: states are KB-sized per group and merge associatively, so a
  * 100 TB fact folds map-side into an AGG table and rollups read
  * states, never raw rows.
  */
object AggStateCombinators {

  /** Resolve `fname(args…)` to its AggregateFunction via the session
    * catalog (builtins + every graft-registered aggregate). Runs at
    * analysis time on the driver. */
  def resolve(fname: String, args: Seq[Expression]): AggregateFunction = {
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("agg_state requires an active SparkSession"))
    val built = spark.sessionState.catalog.lookupFunction(FunctionIdentifier(fname), args)
    built match {
      case ae: AggregateExpression => ae.aggregateFunction
      case af: AggregateFunction => af
      case other => throw new IllegalArgumentException(
        s"agg_state: '$fname' is not an aggregate function (got ${other.getClass.getSimpleName})")
    }
  }

  /** Replace the inner agg's inputs with typed null literals: union /
    * merge never evaluate them (states arrive pre-aggregated), but the
    * types must survive so buffer schema / result type / serialized
    * layout match the states written by `agg_state`. */
  def neutered(af: AggregateFunction): AggregateFunction =
    af.withNewChildren(af.children.map(c => Literal.create(null, c.dataType)))
      .asInstanceOf[AggregateFunction]
}

/** Uniform partial-state lifecycle over the three aggregate flavors. */
private[agg] sealed trait StateDriver extends Serializable {
  def create(): Any
  def update(buf: Any, input: InternalRow): Any
  def merge(a: Any, b: Any): Any
  def evalFinal(buf: Any): Any
  def serialize(buf: Any): Array[Byte]
  def deserialize(bytes: Array[Byte]): Any
}

private[agg] object StateDriver {
  def apply(af: AggregateFunction): StateDriver = af match {
    case t: TypedImperativeAggregate[_] =>
      new TypedDriver(t.asInstanceOf[TypedImperativeAggregate[Any]])
    case d: DeclarativeAggregate => new DeclDriver(d)
    case i: ImperativeAggregate => new ImpDriver(i)
    case other => throw new IllegalArgumentException(
      s"agg_state: unsupported aggregate flavor ${other.getClass.getName}")
  }
}

private[agg] final class TypedDriver(t: TypedImperativeAggregate[Any]) extends StateDriver {
  def create(): Any = t.createAggregationBuffer()
  def update(buf: Any, input: InternalRow): Any = t.update(buf, input)
  def merge(a: Any, b: Any): Any = t.merge(a, b)
  def evalFinal(buf: Any): Any = t.eval(buf)
  def serialize(buf: Any): Array[Byte] = t.serialize(buf)
  def deserialize(bytes: Array[Byte]): Any = t.deserialize(bytes)
}

/** Shared row-buffer machinery (serialize via UnsafeRow bytes). */
private[agg] abstract class RowDriver(types: Seq[DataType]) extends StateDriver {
  @transient private lazy val toUnsafe = UnsafeProjection.create(
    types.zipWithIndex.map { case (dt, i) => BoundReference(i, dt, nullable = true) })
  def serialize(buf: Any): Array[Byte] =
    toUnsafe(buf.asInstanceOf[InternalRow]).copy().getBytes
  def deserialize(bytes: Array[Byte]): Any = {
    val ur = new UnsafeRow(types.length)
    ur.pointTo(bytes, bytes.length)
    val row = new SpecificInternalRow(types)
    var i = 0
    while (i < types.length) {
      if (ur.isNullAt(i)) row.setNullAt(i) else row.update(i, ur.get(i, types(i)))
      i += 1
    }
    row
  }
}

private[agg] final class DeclDriver(d: DeclarativeAggregate)
    extends RowDriver(d.aggBufferAttributes.map(_.dataType)) {
  private val bufAttrs = d.aggBufferAttributes
  private val n = bufAttrs.length

  /** Bind buffer attrs to 0..n-1 and (for update) shift the inner's
    * already-bound input references past the buffer columns, so the
    * expressions evaluate against JoinedRow(buffer, input). */
  private def bindJoined(e: Expression, right: Seq[Attribute]): Expression = e.transform {
    case a: AttributeReference =>
      val li = bufAttrs.indexWhere(_.exprId == a.exprId)
      if (li >= 0) BoundReference(li, a.dataType, a.nullable)
      else {
        val ri = right.indexWhere(_.exprId == a.exprId)
        require(ri >= 0, s"agg_state: unbound reference $a in ${d.prettyName}")
        BoundReference(n + ri, a.dataType, a.nullable)
      }
    case b: BoundReference => BoundReference(b.ordinal + n, b.dataType, b.nullable)
  }

  // MutableProjection.create = whole-stage-style codegen with an
  // interpreted fallback. Measured (SCALING.md round-7 micro-bench):
  // the keys_agg_state_generic gate is scan-dominated at sf0.1 (delta
  // within noise) but codegen takes 29% off the gate wall at sf1
  // (1.605 → 1.145 s) — the per-row update/merge term that grows with
  // rows-per-state, i.e. the inner loop of a 100 TB fact scan.
  @transient private lazy val initProj =
    MutableProjection.create(d.initialValues)
  @transient private lazy val updateProj =
    MutableProjection.create(d.updateExpressions.map(bindJoined(_, Nil)))
  @transient private lazy val mergeProj =
    MutableProjection.create(
      d.mergeExpressions.map(bindJoined(_, d.inputAggBufferAttributes)))
  @transient private lazy val evalExpr =
    bindJoined(d.evaluateExpression, Nil)
  @transient private lazy val joined = new JoinedRow

  def create(): Any = {
    val row = new SpecificInternalRow(bufAttrs.map(_.dataType))
    initProj.target(row)(InternalRow.empty)
    row
  }
  def update(buf: Any, input: InternalRow): Any = {
    val b = buf.asInstanceOf[InternalRow]
    updateProj.target(b)(joined(b, input))
    b
  }
  def merge(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[InternalRow]
    mergeProj.target(l)(joined(l, b.asInstanceOf[InternalRow]))
    l
  }
  def evalFinal(buf: Any): Any = evalExpr.eval(buf.asInstanceOf[InternalRow])
}

private[agg] final class ImpDriver(i0: ImperativeAggregate)
    extends RowDriver(i0.aggBufferAttributes.map(_.dataType)) {
  // standalone buffer rows: both offsets at 0
  private val i = i0.withNewMutableAggBufferOffset(0).withNewInputAggBufferOffset(0)
  def create(): Any = {
    val row = new SpecificInternalRow(i.aggBufferAttributes.map(_.dataType))
    i.initialize(row)
    row
  }
  def update(buf: Any, input: InternalRow): Any = {
    i.update(buf.asInstanceOf[InternalRow], input); buf
  }
  def merge(a: Any, b: Any): Any = {
    i.merge(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow]); a
  }
  def evalFinal(buf: Any): Any = i.eval(buf.asInstanceOf[InternalRow])
}

/** `agg_state('f', args…)`: aggregate raw inputs into the inner
  * aggregate's serialized partial state (BINARY). */
case class AggStateAgg(
    inner: AggregateFunction,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Any] {

  @transient private lazy val driver = StateDriver(inner)

  override def children: Seq[Expression] = inner.children
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"agg_state(${inner.prettyName})"

  override def createAggregationBuffer(): Any = driver.create()
  override def update(buf: Any, input: InternalRow): Any = driver.update(buf, input)
  override def merge(a: Any, b: Any): Any = driver.merge(a, b)
  override def eval(buf: Any): Any = driver.serialize(buf)
  override def serialize(buf: Any): Array[Byte] = driver.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Any = driver.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): AggStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AggStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): Expression =
    copy(inner = inner.withNewChildren(nc).asInstanceOf[AggregateFunction])
}

/** `agg_state_union('f', state)` (isMerge=false → BINARY merged
  * state) and `agg_state_merge('f', state)` (isMerge=true → the inner
  * aggregate's final value). The inner is pre-neutered: its children
  * are typed null literals, never evaluated. */
case class AggStateMergeAgg(
    inner: AggregateFunction,
    stateExpr: Expression,
    isMerge: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Any] {

  @transient private lazy val driver = StateDriver(inner)

  override def children: Seq[Expression] = Seq(stateExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = if (isMerge) inner.dataType else BinaryType
  override def prettyName: String =
    s"agg_state_${if (isMerge) "merge" else "union"}(${inner.prettyName})"

  override def createAggregationBuffer(): Any = driver.create()
  override def update(buf: Any, input: InternalRow): Any = {
    val bytes = stateExpr.eval(input)
    if (bytes == null) buf
    else driver.merge(buf, driver.deserialize(bytes.asInstanceOf[Array[Byte]]))
  }
  override def merge(a: Any, b: Any): Any = driver.merge(a, b)
  override def eval(buf: Any): Any =
    if (isMerge) driver.evalFinal(buf) else driver.serialize(buf)
  override def serialize(buf: Any): Array[Byte] = driver.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Any = driver.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): AggStateMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AggStateMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(nc: IndexedSeq[Expression]): Expression =
    copy(stateExpr = nc(0))
}
