package graft

/** The single JSON string escaper (Bench output, Verify oracle dump,
  * TopoJSON properties previously carried three near-identical copies —
  * an escaping gap fixed in one had to be re-found in the others).
  * Escapes backslash, quote and ALL control chars (< 0x20).
  */
object JsonUtil {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }

  def quote(s: String): String = "\"" + esc(s) + "\""

  /** Locale-independent fixed-decimal number rendering for JSON output
    * (the f-interpolator uses the JVM default locale; a comma-decimal
    * locale would emit invalid JSON).
    */
  def num(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, java.lang.Double.valueOf(v))
}
