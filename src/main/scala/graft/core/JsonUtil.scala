package graft.core

/** Shared JSON string escaping (quote, backslash, control chars) — used by
  * every hand-rolled JSON emitter in the repo. */
object JsonUtil {
  def escape(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
