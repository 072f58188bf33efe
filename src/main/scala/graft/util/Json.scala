package graft.util

/** Minimal JSON rendering for the harness artifacts (`oracle_sql.json`,
  * `oracle_iter.json`) — escaping per RFC 8259: backslash, quote, and
  * ALL control chars (<0x20). A tab or CR in builder-authored SQL
  * would otherwise make the driver's json.load fail and silently zero
  * the round's correctness. */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Ordered string→string object. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${quote(k)}: $v" }
      .mkString("{", ",", "}")
}
