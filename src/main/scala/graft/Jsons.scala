package graft

/** Minimal JSON string escaping for the engine's sidecar artifacts
  * (oracle_sql.json, _failures.json, bench_out.json): backslash, quote,
  * and ALL control chars (<0x20) — a tab or CR in builder-authored SQL
  * or an exception message would otherwise make the driver's json.load
  * fail and silently zero the round's correctness.
  */
object Jsons {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `{ "k": "v", ... }` with every key and value escaped. */
  def obj(kv: Iterable[(String, String)]): String =
    kv.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
