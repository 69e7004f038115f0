package graft

/** One serializer for the oracle-SQL JSON ({query: sql}) shared by
  * Verify (the driver's correctness dump) and Bench (the same-session
  * DuckDB wall) — two hand-rolled copies of the escaping once
  * desynchronized would silently split the two consumers' views of the
  * same oracle set.
  *
  * Escapes backslash, quote, and ALL control chars (<0x20): a tab or CR
  * in builder-authored SQL would otherwise make the driver's json.load
  * fail and silently zero the round's correctness.
  */
object OracleJson {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
    .mkString("{", ",", "}")
}
