package graft

/** Minimal JSON string escaping shared by the verify dump and the HTTP
  * receiver: backslash, quote, and ALL control chars (< 0x20) — a tab or
  * CR left raw would break any strict JSON reader downstream. */
object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
