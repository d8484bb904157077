package graft

/** Test-only HTML normalizer — port of the reference's `condenseHtml`
  * test utility (`/root/reference/src/utils/string.ts:13-60`):
  * collapse inter-tag whitespace, squeeze runs of whitespace, trim,
  * and trim whitespace around tag content. Used for
  * whitespace-resilient HTML assertions (SURVEY.md §2.2 F7). */
object TestHtml {
  def condenseHtml(html: String): String = {
    var c = html
    c = c.replaceAll(">\\s+<", "><")
    c = c.replaceAll("\\s\\s+", " ")
    c = c.trim
    c = ">\\s+(.+?)\\s+<".r.replaceAllIn(c,
      m => java.util.regex.Matcher.quoteReplacement(s">${m.group(1).trim}<"))
    c
  }
}
