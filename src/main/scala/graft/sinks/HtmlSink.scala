package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.Canonical

/** HTML-table sink, byte-compatible with the reference's fixed
  * skeleton (`/root/reference/src/renderers/htmlRenderer.ts:23-135`):
  * the same prologue/`<style>`/`<thead>` block, one `<tr>` per row
  * with HTML-escaped cells at the same indentation, a
  * `No data available` row (colspan=6) for empty input, and the same
  * epilogue. Driver-side for the same reason as [[JsonSink]].
  */
object HtmlSink {

  /** `& < > " '` → entities, in the reference's replacement order
    * (`/root/reference/src/utils/string.ts:1-11`). `&` first, so
    * later-introduced entities are not double-escaped. */
  def escapeHtml(s: String): String =
    s.replace("&", "&amp;")
      .replace("<", "&lt;")
      .replace(">", "&gt;")
      .replace("\"", "&quot;")
      .replace("'", "&#039;")

  private val prologue: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |  <meta charset="UTF-8">
      |  <meta name="viewport" content="width=device-width, initial-scale=1.0">
      |  <title>Data Output</title>
      |  <style>
      |    body { font-family: sans-serif; margin: 20px; }
      |    table { border-collapse: collapse; width: 100%; margin-top: 20px; }
      |    th, td { border: 1px solid #ddd; padding: 8px; text-align: left; }
      |    th { background-color: #f2f2f2; }
      |    tr:nth-child(even) { background-color: #f9f9f9; }
      |  </style>
      |</head>
      |<body>
      |  <h1>Processed Data</h1>
      |  <table>
      |    <thead>
      |      <tr>
      |""".stripMargin

  private val epilogue: String =
    """    </tbody>
      |  </table>
      |</body>
      |</html>
      |""".stripMargin

  def render(df: DataFrame): String = {
    val rows = JsonSink.collectOrdered(df)
    val sb = new StringBuilder
    sb.append(prologue)
    Canonical.headers.foreach(h => sb.append(s"        <th>${escapeHtml(h)}</th>\n"))
    sb.append("      </tr>\n")
    sb.append("    </thead>\n")
    sb.append("    <tbody>\n")
    if (rows.isEmpty) {
      sb.append(s"""      <tr><td colspan="${Canonical.headers.length}" style="text-align:center;">No data available</td></tr>\n""")
    } else {
      rows.foreach { values =>
        sb.append("      <tr>\n")
        values.foreach(v => sb.append(s"        <td>${escapeHtml(v.getOrElse(""))}</td>\n"))
        sb.append("      </tr>\n")
      }
    }
    sb.append(epilogue)
    sb.toString
  }
}
