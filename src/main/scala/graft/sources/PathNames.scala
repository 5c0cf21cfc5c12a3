package graft.sources

/** Hive-style partition-directory name codec shared by the lake
  * readers/writers. Spark's `ExternalCatalogUtils.escapePathName`
  * percent-encodes the characters that break a path segment but does
  * NOT escape `'+'` — so decoding dir names with `URLDecoder` (a
  * query-string codec that maps `'+'` to a space) silently corrupts
  * any partition value containing a literal plus (`a+b` → `a b`).
  * This decoder reverses ONLY `%XX` sequences, exactly the inverse of
  * the hive escaping every writer here and in Spark produces. */
object PathNames {

  /** Decode `%XX` escapes (runs of them decode as UTF-8 bytes, the
    * URLEncoder/escapePathName rendering); every other character —
    * including `'+'` — passes through verbatim. A `'%'` not followed
    * by two hex digits also passes through rather than throwing:
    * foreign layouts may contain raw percent signs. */
  private[graft] def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream(8)
    def flush(): Unit = if (bytes.size() > 0) {
      sb.append(new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) { bytes.write((h << 4) | l); i += 3 }
        else { flush(); sb.append(c); i += 1 }
      } else { flush(); sb.append(c); i += 1 }
    }
    flush()
    sb.toString
  }

  /** Hive-style escape — delegates to Spark's
    * `ExternalCatalogUtils.escapePathName` so a value re-rendered into
    * a partition directory round-trips byte-for-byte with what
    * `partitionBy` staging wrote (`'/'`, `'='`, `':'` etc. become
    * `%XX`; `'+'` stays literal, matching [[unescapePathName]]). */
  private[graft] def escapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(s)
}
