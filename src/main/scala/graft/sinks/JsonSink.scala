package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.Canonical

/** Streaming-JSON-array sink, byte-compatible with the reference
  * (`/root/reference/src/renderers/jsonRenderer.ts:17-48`):
  * `[\n  {row},\n  {row}\n]\n`, keys in canonical order, compact
  * objects, empty input → exactly `[]`.
  *
  * Spark's own JSON writer emits JSON-Lines with no array framing, so
  * this is deliberately a driver-side renderer over `collect()` — the
  * reference semantics (single ordered text document) are inherently
  * driver-sided; the distributed work (scan + normalize) has already
  * happened upstream. Rows render in input order via the carried
  * order index.
  */
object JsonSink {

  def render(df: DataFrame): String = {
    val rows = collectOrdered(df)
    if (rows.isEmpty) "[]"
    else rows.map(renderRow).mkString("[\n  ", ",\n  ", "\n]\n")
  }

  /** Rows in input order, aligned to the 6 canonical headers.
    * `None` = the column is absent from the frame entirely (JSON
    * omits the key; HTML renders an empty cell, mirroring the two
    * reference renderers' treatment of missing keys). */
  private[sinks] def collectOrdered(df: DataFrame): Seq[Seq[Option[String]]] = {
    val ordered =
      if (df.columns.contains(Canonical.idxCol)) df.orderBy(col(Canonical.idxCol))
      else df
    val cols = Canonical.headers.filter(ordered.columns.contains)
    ordered.select(cols.map(c => col(s"`$c`").cast("string")): _*)
      .collect()
      .toSeq
      .map { r =>
        val present = cols.zipWithIndex
          .map { case (c, i) => c -> Option(r.getString(i)).getOrElse("") }
          .toMap
        Canonical.headers.map(present.get)
      }
  }

  private def renderRow(values: Seq[Option[String]]): String =
    Canonical.headers.zip(values)
      .collect { case (h, Some(v)) => s"${jsonString(h)}:${jsonString(v)}" }
      .mkString("{", ",", "}")

  /** JSON string literal, matching `JSON.stringify`: short escapes for
    * the common control chars, `\ u` form for the rest, non-ASCII
    * passes through (output is UTF-8). */
  private[sinks] def jsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
