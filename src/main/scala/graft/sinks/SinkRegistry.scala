package graft.sinks

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Map-backed renderer registry — the reference's renderer plugin
  * surface (`/root/reference/src/renderers/index.ts:12-58`):
  * case-insensitive lookup, `register` for extension, unknown type →
  * error naming the registered set. A renderer maps the canonical
  * frame to the final output document string. */
object SinkRegistry {

  type Renderer = DataFrame => String

  private val renderers = TrieMap[String, Renderer](
    "json" -> JsonSink.render,
    "html" -> HtmlSink.render)

  def register(name: String, renderer: Renderer): Unit =
    renderers.put(name.toLowerCase, renderer)

  def supported: Seq[String] = renderers.keys.toSeq.sorted

  def apply(name: String): Renderer =
    renderers.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"Unsupported output type: $name. Supported types are: ${supported.mkString(", ")}"))
}
