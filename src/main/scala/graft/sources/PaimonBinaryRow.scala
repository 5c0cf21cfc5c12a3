package graft.sources

import org.apache.spark.sql.types._

/** Decoder for Apache Paimon's serialized BinaryRow — the partition
  * tuples, key bounds, and stats rows inside real Paimon manifests.
  *
  * Layout (pinned against a real paimon-written fixture's bytes, and
  * matching the published Flink/Paimon `BinaryRow` design the format
  * inherits):
  *
  *   [4-byte BIG-endian arity]
  *   [null-bits region: ((arity + 63 + 8) / 64) · 8 bytes —
  *      byte 0 is the row-kind header, field i's null bit is
  *      bit (8 + i) LSB-first]
  *   [arity × 8-byte little-endian field slots]
  *   [variable-length section]
  *
  * Fixed-width values sit little-endian at the slot start. Strings /
  * bytes ≤ 7 bytes are COMPACT: the slot's high byte is 0x80 | len and
  * the data occupies the slot's first `len` bytes; longer values store
  * `(offset << 32) | len` with `offset` relative to the row start
  * (after the arity prefix). Timestamps of precision ≤ 3 are a compact
  * millis long; higher precisions store 8 variable bytes of millis
  * with nano-of-milli in the slot's low word. Decimals of precision
  * ≤ 18 are a compact unscaled long; larger ones store the unscaled
  * BigInteger's big-endian twos-complement bytes.
  *
  * Worked example from the fixture (partition row `("banana")`):
  * `00000001` arity 1, 8 zero null-bits bytes, slot
  * `62 61 6e 61 6e 61 00 86` = data "banana" + high byte
  * 0x86 = compact | len 6. */
object PaimonBinaryRow {

  private def nullBitsBytes(arity: Int): Int = ((arity + 63 + 8) / 64) * 8

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }
  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff)) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Short =
    (((b(off) & 0xff)) | ((b(off + 1) & 0xff) << 8)).toShort

  /** Raw variable-or-compact bytes of a string/binary slot. */
  private def varBytes(b: Array[Byte], rowStart: Int, slotOff: Int): Array[Byte] = {
    val slot = leLong(b, slotOff)
    if ((slot & 0x8000000000000000L) != 0L) {
      val len = ((slot >>> 56) & 0x7f).toInt
      java.util.Arrays.copyOfRange(b, slotOff, slotOff + len)
    } else {
      val off = (slot >>> 32).toInt
      val len = slot.toInt
      java.util.Arrays.copyOfRange(b, rowStart + off, rowStart + off + len)
    }
  }

  /** Decode field values rendered as STRINGS (the manifest partition
    * contract this reader uses everywhere: dir naming, typed literal
    * re-attachment via CAST). `types` aligns with the partition row's
    * field order; `timestampPrecision(i)` only matters for timestamp
    * fields (paimon compacts precision ≤ 3 into the slot). Null fields
    * decode to null. */
  def decode(bytes: Array[Byte], types: Seq[DataType],
      timestampPrecision: Int => Int = _ => 6): Seq[String] = {
    require(bytes.length >= 4, s"binary row too short: ${bytes.length}")
    val arity = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    require(arity == types.length,
      s"binary row arity $arity != expected ${types.length}")
    val rowStart = 4
    val nb = nullBitsBytes(arity)
    def isNull(i: Int): Boolean = {
      val bit = 8 + i
      (bytes(rowStart + (bit >>> 3)) & (1 << (bit & 7))) != 0
    }
    types.zipWithIndex.map { case (dt, i) =>
      if (isNull(i)) null
      else {
        val slot = rowStart + nb + 8 * i
        dt match {
          case BooleanType => (bytes(slot) != 0).toString
          case ByteType => bytes(slot).toString
          case ShortType => leShort(bytes, slot).toString
          case IntegerType => leInt(bytes, slot).toString
          case LongType => leLong(bytes, slot).toString
          case FloatType =>
            java.lang.Float.intBitsToFloat(leInt(bytes, slot)).toString
          case DoubleType =>
            java.lang.Double.longBitsToDouble(leLong(bytes, slot)).toString
          case StringType =>
            new String(varBytes(bytes, rowStart, slot), "UTF-8")
          case BinaryType => // hex rendering; partition binaries are rare
            varBytes(bytes, rowStart, slot).map(x => f"$x%02x").mkString
          case DateType =>
            java.time.LocalDate.ofEpochDay(leInt(bytes, slot).toLong).toString
          case TimestampType =>
            val (millis, nanoOfMilli) =
              if (timestampPrecision(i) <= 3) (leLong(bytes, slot), 0)
              else {
                val s = leLong(bytes, slot)
                (leLong(bytes, rowStart + (s >>> 32).toInt), s.toInt)
              }
            val inst = java.time.Instant.ofEpochMilli(millis)
              .plusNanos(nanoOfMilli.toLong)
            // hive-style rendering, parseable by CAST(.. AS TIMESTAMP)
            java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
              .format(java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
          case d: DecimalType =>
            val unscaled =
              if (d.precision <= 18) java.math.BigInteger.valueOf(leLong(bytes, slot))
              else new java.math.BigInteger(varBytes(bytes, rowStart, slot))
            new java.math.BigDecimal(unscaled, d.scale).toPlainString
          case other => throw new IllegalArgumentException(
            s"unsupported paimon partition type $other")
        }
      }
    }
  }

  /** Encode typed values into the serialized BinaryRow form —
    * the exact inverse of [[decode]], byte-pinned in PaimonReadSpec
    * against the real fixture's partition and stats rows. Values
    * arrive as the JVM types the reader renders from (String, Int,
    * Long, Short, Byte, Boolean, Float, Double, java.time.LocalDate,
    * java.time.Instant, java.math.BigDecimal, Array[Byte]); null
    * encodes as a set null bit + zero slot. */
  def encode(values: Seq[Any], types: Seq[DataType],
      timestampPrecision: Int => Int = _ => 6): Array[Byte] = {
    require(values.length == types.length, "values/types arity mismatch")
    val arity = values.length
    val nb = nullBitsBytes(arity)
    val fixedLen = nb + 8 * arity
    val varBuf = new java.io.ByteArrayOutputStream()
    val fixed = new Array[Byte](fixedLen)
    def setNull(i: Int): Unit = {
      val bit = 8 + i
      fixed(bit >>> 3) = (fixed(bit >>> 3) | (1 << (bit & 7))).toByte
    }
    def putLe(off: Int, v: Long, bytes: Int): Unit = {
      var i = 0
      while (i < bytes) { fixed(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putVarOrCompact(slot: Int, data: Array[Byte]): Unit =
      if (data.length <= 7) {
        System.arraycopy(data, 0, fixed, slot, data.length)
        fixed(slot + 7) = (0x80 | data.length).toByte
      } else {
        val off = fixedLen + varBuf.size() // relative to row start
        varBuf.write(data, 0, data.length)
        putLe(slot, (off.toLong << 32) | (data.length.toLong & 0xffffffffL), 8)
      }
    types.zipWithIndex.foreach { case (dt, i) =>
      val slot = nb + 8 * i
      val v = values(i)
      if (v == null) setNull(i)
      else dt match {
        case BooleanType => fixed(slot) = if (v.asInstanceOf[Boolean]) 1 else 0
        case ByteType => fixed(slot) = v.asInstanceOf[Byte]
        case ShortType => putLe(slot, v.asInstanceOf[Short].toLong, 2)
        case IntegerType => putLe(slot, v.asInstanceOf[Int].toLong, 4)
        case LongType => putLe(slot, v.asInstanceOf[Long], 8)
        case FloatType =>
          putLe(slot, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong, 4)
        case DoubleType =>
          putLe(slot, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
        case StringType =>
          putVarOrCompact(slot, v.toString.getBytes("UTF-8"))
        case BinaryType => putVarOrCompact(slot, v.asInstanceOf[Array[Byte]])
        case DateType =>
          val days = v match {
            case d: java.time.LocalDate => d.toEpochDay
            case d: java.sql.Date => d.toLocalDate.toEpochDay
            case n: Number => n.longValue()
          }
          putLe(slot, days, 4)
        case TimestampType =>
          val (millis, nanoOfMilli) = v match {
            case t: java.time.Instant =>
              (t.toEpochMilli, (t.getNano % 1000000))
            case t: java.sql.Timestamp =>
              (t.getTime, t.getNanos % 1000000)
            case n: Number => (n.longValue(), 0)
          }
          if (timestampPrecision(i) <= 3) putLe(slot, millis, 8)
          else {
            val off = fixedLen + varBuf.size()
            var j = 0
            while (j < 8) { varBuf.write(((millis >>> (8 * j)) & 0xff).toInt); j += 1 }
            putLe(slot, (off.toLong << 32) | (nanoOfMilli.toLong & 0xffffffffL), 8)
          }
        case d: DecimalType =>
          val bd = (v match {
            case b: java.math.BigDecimal => b
            case b: BigDecimal => b.bigDecimal
            case s: String => new java.math.BigDecimal(s)
          }).setScale(d.scale)
          if (d.precision <= 18) putLe(slot, bd.unscaledValue().longValueExact(), 8)
          else putVarOrCompact(slot, bd.unscaledValue().toByteArray)
        case other => throw new IllegalArgumentException(
          s"unsupported paimon partition type $other")
      }
    }
    val out = new Array[Byte](4 + fixedLen + varBuf.size())
    out(0) = ((arity >>> 24) & 0xff).toByte
    out(1) = ((arity >>> 16) & 0xff).toByte
    out(2) = ((arity >>> 8) & 0xff).toByte
    out(3) = (arity & 0xff).toByte
    System.arraycopy(fixed, 0, out, 4, fixedLen)
    System.arraycopy(varBuf.toByteArray, 0, out, 4 + fixedLen, varBuf.size())
    out
  }
}
