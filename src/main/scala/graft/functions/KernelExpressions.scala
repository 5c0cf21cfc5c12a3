package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standalone evaluation kernels for reference functions that are not
  * expressible as compositions of Spark builtins (FE
  * `catalog/FunctionSet.java` names; BE kernels cited per class).
  * All are scan-side scalar work: CodegenFallback costs one virtual
  * call per row here, not a plan-shape change — acceptable off the
  * TPC-H hot path, and each stays fully distributed.
  */
object KernelExpressions {
  /** Spark Decimal is not a java.lang.Number — normalize numerics. */
  def toDouble(v: Any): Double = v match {
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }
}

/** xx_hash32(str) — real XXH32, seed 0 (reference
  * `be/src/exprs/hash_functions.cpp` xx_hash32; XXH32 spec is public
  * domain). Operates on the UTF-8 bytes of the input. */
case class XxHash32Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "xx_hash32"

  private val P1 = 0x9E3779B1; private val P2 = 0x85EBCA77
  private val P3 = 0xC2B2AE3D; private val P4 = 0x27D4EB2F
  private val P5 = 0x165667B1

  private def getIntLE(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8) | ((d(i + 2) & 0xff) << 16) | ((d(i + 3) & 0xff) << 24)

  private[functions] def xxh32(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    var idx = 0
    var h = 0
    if (len >= 16) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (idx <= len - 16) {
        v1 = Integer.rotateLeft(v1 + getIntLE(data, idx) * P2, 13) * P1; idx += 4
        v2 = Integer.rotateLeft(v2 + getIntLE(data, idx) * P2, 13) * P1; idx += 4
        v3 = Integer.rotateLeft(v3 + getIntLE(data, idx) * P2, 13) * P1; idx += 4
        v4 = Integer.rotateLeft(v4 + getIntLE(data, idx) * P2, 13) * P1; idx += 4
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P5
    h += len
    while (idx <= len - 4) {
      h = Integer.rotateLeft(h + getIntLE(data, idx) * P3, 17) * P4; idx += 4
    }
    while (idx < len) {
      h = Integer.rotateLeft(h + (data(idx) & 0xff) * P5, 11) * P1; idx += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => xxh32(s.getBytes, 0)
    case b: Array[Byte] => xxh32(b, 0)
    case other => xxh32(UTF8String.fromString(String.valueOf(other)).getBytes, 0)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** array_contains_seq(haystack, needle) — true when `needle` appears
  * in `haystack` as a CONTIGUOUS subsequence (reference
  * `be/src/exprs/array_functions.cpp:1139` ArrayHasImpl<false, true>;
  * ClickHouse hasSubstr semantics: empty needle → true, null
  * elements match null elements). */
case class ArrayContainsSeq(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_contains_seq"

  override def nullSafeEval(h: Any, n: Any): Any = {
    val hay = h.asInstanceOf[ArrayData]
    val needle = n.asInstanceOf[ArrayData]
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val hn = hay.numElements(); val nn = needle.numElements()
    if (nn == 0) return true
    if (nn > hn) return false
    val hv = (0 until hn).map(i => if (hay.isNullAt(i)) null else hay.get(i, et))
    val nv = (0 until nn).map(i => if (needle.isNullAt(i)) null else needle.get(i, et))
    var start = 0
    while (start <= hn - nn) {
      var i = 0
      while (i < nn && ((hv(start + i) == null && nv(i) == null) ||
          (hv(start + i) != null && hv(start + i) == nv(i)))) i += 1
      if (i == nn) return true
      start += 1
    }
    false
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** uuid_v7() — RFC 9562 time-ordered UUID (reference FunctionSet
  * uuid_v7): 48-bit unix millis, version 7, random tail. */
case class UuidV7() extends LeafExpression with Nondeterministic with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "uuid_v7"
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()
  override protected def evalInternal(input: InternalRow): Any = {
    val ms = System.currentTimeMillis()
    val randA = rng.nextInt(1 << 12)
    val msb = (ms << 16) | 0x7000L | randA // 48-bit ts, version 7, 12 random bits
    val lsb = (rng.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L // variant 10
    UTF8String.fromString(new java.util.UUID(msb, lsb).toString)
  }
}

/** sleep(seconds) → true after sleeping — the reference's testing aid
  * (`be/src/exprs/utility_functions.cpp` sleep). Nondeterministic so
  * constant folding can't elide the wait. */
case class SleepExpr(child: Expression) extends UnaryExpression
  with Nondeterministic with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sleep"
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) Thread.sleep((KernelExpressions.toDouble(v) * 1000).toLong)
    true
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Shared Jackson plumbing + MySQL-ish '$.a.b[0]' path parsing for the
  * JSON editing kernels (reference `be/src/exprs/json_functions.cpp`,
  * jsonpath subset: member access and array index). */
object JsonKernel {
  sealed trait Step
  final case class Key(k: String) extends Step
  final case class Idx(i: Int) extends Step

  val mapper = new ObjectMapper()

  def parse(s: UTF8String): Option[JsonNode] =
    try Option(mapper.readTree(s.toString)) catch { case _: Exception => None }

  /** '$.a.b[0]' → Seq(Key("a"), Key("b"), Idx(0)). */
  def parsePath(path: String): Option[Seq[Step]] = {
    val p = path.trim
    if (!p.startsWith("$")) return None
    val steps = scala.collection.mutable.ListBuffer.empty[Step]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          val end0 = p.indexWhere(c => c == '.' || c == '[', i + 1)
          val end = if (end0 < 0) p.length else end0
          if (end <= i + 1) return None
          steps += Key(p.substring(i + 1, end)); i = end
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) return None
          val idx = try p.substring(i + 1, end).trim.toInt catch { case _: Exception => return None }
          steps += Idx(idx); i = end + 1
        case _ => return None
      }
    }
    Some(steps.toList)
  }

  def navigate(root: JsonNode, steps: Seq[Step]): Option[JsonNode] =
    steps.foldLeft(Option(root)) {
      case (Some(o: ObjectNode), Key(k)) => Option(o.get(k))
      case (Some(a: ArrayNode), Idx(i)) if i >= 0 && i < a.size => Option(a.get(i))
      case _ => None
    }

  /** MySQL json_contains: scalars by equality; target array contains
    * candidate if any element contains it (or elementwise for a
    * candidate array); objects by recursive key containment. */
  def contains(target: JsonNode, cand: JsonNode): Boolean = (target, cand) match {
    case (t: ObjectNode, c: ObjectNode) =>
      val it = c.fields()
      var ok = true
      while (ok && it.hasNext) {
        val e = it.next()
        val tv = t.get(e.getKey)
        ok = tv != null && contains(tv, e.getValue)
      }
      ok
    case (t: ArrayNode, c: ArrayNode) =>
      (0 until c.size).forall { i =>
        val ci = c.get(i)
        (0 until t.size).exists(j => contains(t.get(j), ci))
      }
    case (t: ArrayNode, c) => (0 until t.size).exists(j => contains(t.get(j), c))
    case (t, c) => t == c
  }
}

/** json_pretty(json) — multi-line indented render (reference
  * FunctionSet json_pretty); NULL on malformed input. */
case class JsonPretty(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_pretty"
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonKernel.parse(v.asInstanceOf[UTF8String]).map { n =>
      UTF8String.fromString(
        JsonKernel.mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n))
    }.orNull
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** is_json_scalar(json) — true when the document is a bare value
  * (not object/array); NULL on malformed input. */
case class IsJsonScalar(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_json_scalar"
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonKernel.parse(v.asInstanceOf[UTF8String])
      .map(n => Boolean.box(!n.isContainerNode)).orNull
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** json_contains(target, candidate) — MySQL containment. */
case class JsonContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "json_contains"
  override def nullable: Boolean = true
  override def nullSafeEval(t: Any, c: Any): Any = {
    (JsonKernel.parse(t.asInstanceOf[UTF8String]),
      JsonKernel.parse(c.asInstanceOf[UTF8String])) match {
      case (Some(tn), Some(cn)) => Boolean.box(JsonKernel.contains(tn, cn))
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** json_remove(json, path, ...) — drop the nodes at the given '$.a[i]'
  * paths (MySQL json_remove; '$' itself is not removable → NULL). */
case class JsonRemove(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_remove"
  override def eval(input: InternalRow): Any = {
    val doc = children.head.eval(input)
    if (doc == null) return null
    JsonKernel.parse(doc.asInstanceOf[UTF8String]) match {
      case None => null
      case Some(root) =>
        for (pe <- children.tail) {
          val pv = pe.eval(input)
          if (pv == null) return null
          JsonKernel.parsePath(pv.toString) match {
            case None | Some(Nil) => return null // '$' or malformed
            case Some(steps) =>
              JsonKernel.navigate(root, steps.init).foreach { parent =>
                (parent, steps.last) match {
                  case (o: ObjectNode, JsonKernel.Key(k)) => o.remove(k)
                  case (a: ArrayNode, JsonKernel.Idx(i)) if i >= 0 && i < a.size => a.remove(i)
                  case _ => // missing target: MySQL leaves the doc unchanged
                }
              }
          }
        }
        UTF8String.fromString(JsonKernel.mapper.writeValueAsString(root))
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** json_set(json, path, value, ...) — create-or-replace at each path
  * (MySQL json_set). A value that parses as JSON is inserted
  * structurally; otherwise it becomes a string scalar. */
case class JsonSet(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_set"
  override def eval(input: InternalRow): Any = {
    val doc = children.head.eval(input)
    if (doc == null) return null
    JsonKernel.parse(doc.asInstanceOf[UTF8String]) match {
      case None => null
      case Some(root) =>
        children.tail.grouped(2).foreach {
          case Seq(pe, ve) =>
            val pv = pe.eval(input)
            if (pv == null) return null
            val raw = ve.eval(input)
            val valNode: JsonNode = raw match {
              case null => JsonKernel.mapper.nullNode()
              case s: UTF8String =>
                JsonKernel.parse(s).getOrElse(JsonKernel.mapper.getNodeFactory.textNode(s.toString))
              case n: java.lang.Number => JsonKernel.mapper.valueToTree(n)
              case b: java.lang.Boolean => JsonKernel.mapper.getNodeFactory.booleanNode(b)
              case other => JsonKernel.mapper.getNodeFactory.textNode(String.valueOf(other))
            }
            JsonKernel.parsePath(pv.toString) match {
              case None => return null
              case Some(Nil) => // '$': MySQL replaces the whole doc
                return UTF8String.fromString(JsonKernel.mapper.writeValueAsString(valNode))
              case Some(steps) =>
                JsonKernel.navigate(root, steps.init).foreach { parent =>
                  (parent, steps.last) match {
                    case (o: ObjectNode, JsonKernel.Key(k)) => o.set(k, valNode)
                    case (a: ArrayNode, JsonKernel.Idx(i)) =>
                      if (i >= 0 && i < a.size) a.set(i, valNode)
                      else if (i == a.size) a.add(valNode) // MySQL appends at end
                    case _ =>
                  }
                }
            }
          case _ => return null // odd trailing path with no value
        }
        UTF8String.fromString(JsonKernel.mapper.writeValueAsString(root))
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** hll_empty() / hll_hash(v) / percentile_empty() / percentile_hash(v)
  * — storable-sketch column constructors (reference
  * `be/src/exprs/hyperloglog_functions.cpp` hll_empty/hll_hash,
  * `percentile_functions.cpp` percentile_empty/percentile_hash):
  * defaults and per-row seeds for HLL / PERCENTILE columns in AGG
  * tables. Binary format matches the aggregate kernels
  * (Spark DataSketches HLL; TDigestAggs' TDigestDouble k=500). */
case class HllEmpty() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "hll_empty"
  override def eval(input: InternalRow): Any =
    new org.apache.datasketches.hll.HllSketch(12).toUpdatableByteArray
}

case class HllHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_hash"
  override def nullSafeEval(v: Any): Any = {
    val sk = new org.apache.datasketches.hll.HllSketch(12)
    v match {
      case s: UTF8String => sk.update(s.toString)
      case b: Array[Byte] => sk.update(b)
      case i: java.lang.Integer => sk.update(i.longValue())
      case l: java.lang.Long => sk.update(l.longValue())
      case d: java.lang.Double => sk.update(d.doubleValue())
      case other => sk.update(String.valueOf(other))
    }
    sk.toUpdatableByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class PercentileEmpty() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "percentile_empty"
  override def eval(input: InternalRow): Any =
    new org.apache.datasketches.tdigest.TDigestDouble(500.toShort).toByteArray
}

case class PercentileHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "percentile_hash"
  override def nullSafeEval(v: Any): Any = {
    val td = new org.apache.datasketches.tdigest.TDigestDouble(500.toShort)
    td.update(KernelExpressions.toDouble(v))
    td.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** normalize_text(str) — Unicode canonicalization for corpus prep and
  * dedup keying: NFKC compatibility fold (ligatures, fullwidth forms,
  * NBSP → their canonical equivalents), then NFD decomposition with
  * combining-mark removal (accent strip), root-locale lowercasing,
  * and whitespace collapse. The reference's lower/trim kernels
  * (`be/src/exprs/string_functions.cpp`) compose the same steps ahead
  * of fingerprinting; one expression keeps the hot path single-pass.
  * Deterministic: pure function of the input code points. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(v: Any): Any = {
    import java.text.Normalizer
    val s = v.asInstanceOf[UTF8String].toString
    val folded = Normalizer.normalize(s, Normalizer.Form.NFKC)
    val decomposed = Normalizer.normalize(folded, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    val lowered = sb.toString.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(lowered.replaceAll("\\s+", " ").trim)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** jaro_winkler(a, b) — Jaro-Winkler similarity in [0, 1] (standard
  * definition: match window ⌊max(|a|,|b|)/2⌋−1, transpositions/2,
  * Winkler prefix boost p = 0.1 over at most 4 leading chars, applied
  * only when the Jaro score exceeds 0.7). The entity-resolution
  * companion to the engine's Levenshtein edit distance — used by the
  * fuzzy-matching pipeline to score blocked candidate pairs. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  private def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window); val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    (m.toDouble / a.length + m.toDouble / b.length + (m - t / 2.0) / m) / 3.0
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val j = jaro(a, b)
    if (j <= 0.7) j
    else {
      var p = 0
      val max = math.min(4, math.min(a.length, b.length))
      while (p < max && a.charAt(p) == b.charAt(p)) p += 1
      j + 0.1 * p * (1.0 - j)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
