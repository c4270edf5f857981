package graft.util

/** The one JSON string escaper (quote + backslash + ALL control chars).
  * Every hand-rolled `{"event":...}` line goes through this: a tab or
  * newline in a path/SQL string must never produce an unparseable line.
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def str(s: Any): String = "\"" + escape(s.toString) + "\""
}
