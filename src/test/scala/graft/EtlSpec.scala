package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sinks.{HtmlSink, JsonSink}
import graft.sources.{CsvSource, PrnSource}

/** Fidelity tests for the ETL core, ported 1:1 from the reference's
  * suites (see FIXTURES.md §3 for the mapping). The Workbook2 sample
  * files are read from the read-only reference checkout. */
class EtlSpec extends SparkSpec {

  private val csvPath = "/root/reference/Workbook2.csv"
  private val prnPath = "/root/reference/Workbook2.prn"

  private def tmpFile(content: String, encoding: String = "ISO-8859-1"): String = {
    val f = Files.createTempFile("etlspec_", ".txt")
    f.toFile.deleteOnExit()
    Files.write(f, content.getBytes(encoding))
    f.toString
  }

  private def rows(df: DataFrame): Seq[Map[String, String]] = {
    import org.apache.spark.sql.functions.col
    val ordered = df.orderBy(col(Canonical.idxCol))
    ordered.select(Canonical.headers.map(h => col(s"`$h`")): _*)
      .collect().toSeq
      .map(r => Canonical.headers.zipWithIndex.map { case (h, i) => h -> r.getString(i) }.toMap)
  }

  private val expectedRow1 = Map(
    "Name" -> "Johnson, John", "Address" -> "Voorstraat 32", "Postcode" -> "3122GG",
    "Phone" -> "0203849381", "Credit Limit" -> "10000.00", "Birthday" -> "1987-01-01")
  private val expectedRow7 = Map(
    "Name" -> "Smith, John", "Address" -> "Børkestraße 32", "Postcode" -> "87823",
    "Phone" -> "+44728889838", "Credit Limit" -> "9898.30", "Birthday" -> "1999-09-20")

  // -- CSV source ---------------------------------------------------

  test("CSV: full sample parses to the 7 normalized golden rows") {
    val got = rows(CsvSource.read(spark, csvPath))
    assert(got.length == 7)
    assert(got.head == expectedRow1)
    assert(got(4)("Credit Limit") == "54.50")
    assert(got(4)("Birthday") == "1978-11-09")
    assert(got.last == expectedRow7)
  }

  test("CSV: custom ';' delimiter with quoted commas intact") {
    val p = tmpFile(
      "Name;Address;Postcode;Phone;Credit Limit;Birthday\n" +
        "\"Johnson, John\";Voorstraat 32;3122gg;020 3849381;10000;01/01/1987\n")
    val got = rows(CsvSource.read(spark, p, delimiter = ";"))
    assert(got == Seq(expectedRow1))
  }

  test("CSV: case-varied headers resolve to canonical casing") {
    val p = tmpFile(
      "name,ADDRESS,postcode,pHone,Credit limit,BIRTHDAY\n" +
        "\"Johnson, John\",Voorstraat 32,3122gg,020 3849381,10000,01/01/1987\n")
    val got = rows(CsvSource.read(spark, p))
    assert(got == Seq(expectedRow1))
  }

  test("CSV: missing columns are default-filled") {
    val p = tmpFile(
      "Name,Postcode,Credit Limit,Birthday\n" +
        "\"Johnson, John\",3122gg,10000,01/01/1987\n")
    val got = rows(CsvSource.read(spark, p))
    assert(got == Seq(expectedRow1 + ("Address" -> "") + ("Phone" -> "")))
  }

  test("CSV: extra columns are dropped, all 6 canonical present") {
    val p = tmpFile(
      "Name,Address,ExtraInfoCol,Hobby,Birthday\n" +
        "\"Johnson, John\",Voorstraat 32,ignoreme,golf,01/01/1987\n")
    val got = rows(CsvSource.read(spark, p))
    assert(got.head.keySet == Canonical.headers.toSet)
    assert(got.head("Name") == "Johnson, John")
    assert(got.head("Credit Limit") == "0.00")
    assert(!got.head.values.toSeq.contains("golf"))
  }

  test("CSV: empty input and header-only input yield 0 rows") {
    assert(rows(CsvSource.read(spark, tmpFile(""))).isEmpty)
    assert(rows(CsvSource.read(spark, tmpFile("Name,Address,Postcode,Phone,Credit Limit,Birthday\n"))).isEmpty)
  }

  test("CSV: malformed quote raises a CSV parsing error") {
    val p = tmpFile("Name,Address\n\"Unclosed, oops,Somewhere\n")
    val e = intercept[IllegalArgumentException](CsvSource.read(spark, p))
    assert(e.getMessage.startsWith("CSV parsing error:"))
  }

  // -- PRN source ---------------------------------------------------

  test("PRN: full sample parses to the same 7 golden rows") {
    val got = rows(PrnSource.read(spark, prnPath))
    assert(got.length == 7)
    assert(got.head == expectedRow1)
    assert(got.last == expectedRow7)
  }

  test("PRN: csv and prn sources produce identical normalized rows") {
    assert(rows(CsvSource.read(spark, csvPath)) == rows(PrnSource.read(spark, prnPath)))
  }

  test("PRN: missing headers warn and default-fill") {
    var warnings = Vector.empty[String]
    val p = tmpFile(
      "Name            Postcode Credit Limit Birthday\n" +
        "Johnson, John   3122gg   1000000      19870101\n")
    val got = rows(PrnSource.read(spark, p, warn = w => warnings :+= w))
    assert(got == Seq(expectedRow1 + ("Address" -> "") + ("Phone" -> "")))
    assert(warnings.exists(_.contains("\"Address\" not found")))
    assert(warnings.exists(_.contains("\"Phone\" not found")))
    assert(warnings.exists(_.contains("Missing/unmapped: Address, Phone")))
  }

  test("PRN: unparsable header raises the reference error") {
    val p = tmpFile("ColumnA ColumnB ColumnC\ndata1   data2   data3\n")
    val e = intercept[IllegalArgumentException](
      PrnSource.read(spark, p, warn = _ => ()))
    assert(e.getMessage.startsWith("PRN Error: Could not derive any column specifications"))
  }

  test("PRN: short data lines default the missing tail columns") {
    val p = tmpFile(
      "Name            Address               Postcode Phone         Credit Limit Birthday\n" +
        "Johnson, John   Voorstraat 32         3122gg\n")
    val got = rows(PrnSource.read(spark, p))
    assert(got == Seq(expectedRow1 + ("Phone" -> "") + ("Credit Limit" -> "0.00") + ("Birthday" -> "")))
  }

  test("PRN: non-numeric cents become 0.00") {
    val p = tmpFile(
      "Name            Address               Postcode Phone         Credit Limit Birthday\n" +
        "Johnson, John   Voorstraat 32         3122gg   020 3849381   NOTANUMBER   19870101\n")
    val got = rows(PrnSource.read(spark, p))
    assert(got.head("Credit Limit") == "0.00")
  }

  test("PRN: blank lines between rows are skipped; whitespace-only input is empty") {
    val p = tmpFile(
      "Name            Address               Postcode Phone         Credit Limit Birthday\n" +
        "Johnson, John   Voorstraat 32         3122gg   020 3849381        1000000 19870101\n" +
        "\n" +
        "Smith, John     Børkestraße 32        87823    +44 728 889838      989830 19990920\n")
    val got = rows(PrnSource.read(spark, p))
    assert(got.length == 2)
    assert(got.last == expectedRow7)
    assert(rows(PrnSource.read(spark, tmpFile("   \n \n   "))).isEmpty)
  }

  // -- JSON sink ----------------------------------------------------

  test("JSON: exact framing, canonical key order, and empty case") {
    val json = JsonSink.render(CsvSource.read(spark, csvPath))
    assert(json.startsWith("[\n  {\"Name\":\"Johnson, John\",\"Address\":\"Voorstraat 32\",\"Postcode\":\"3122GG\",\"Phone\":\"0203849381\",\"Credit Limit\":\"10000.00\",\"Birthday\":\"1987-01-01\"},\n  "))
    assert(json.endsWith("\"Birthday\":\"1999-09-20\"}\n]\n"))
    assert(json.count(_ == '{') == 7)
    assert(JsonSink.render(CsvSource.read(spark, tmpFile(""))) == "[]")
  }

  // -- HTML sink ----------------------------------------------------

  test("HTML: skeleton, escaping, and no-data row") {
    val html = HtmlSink.render(CsvSource.read(spark, csvPath))
    assert(html.startsWith("<!DOCTYPE html>\n<html lang=\"en\">\n"))
    assert(html.contains("  <title>Data Output</title>\n"))
    assert(html.contains("        <th>Credit Limit</th>\n"))
    assert(html.contains("        <td>Johnson, John</td>\n"))
    assert(html.contains("Børkestraße 32"))
    assert(html.endsWith("    </tbody>\n  </table>\n</body>\n</html>\n"))

    val empty = HtmlSink.render(CsvSource.read(spark, tmpFile("")))
    assert(empty.contains("""      <tr><td colspan="6" style="text-align:center;">No data available</td></tr>"""))

    assert(HtmlSink.escapeHtml("Data <>&\"'") == "Data &lt;&gt;&amp;&quot;&#039;")
  }

  // -- Cross-format equivalence (the reference's acceptance check) --

  test("csv->json == prn->json and csv->html == prn->html, byte-identical") {
    val csvDf = CsvSource.read(spark, csvPath)
    val prnDf = PrnSource.read(spark, prnPath)
    assert(JsonSink.render(csvDf) == JsonSink.render(prnDf))
    assert(HtmlSink.render(csvDf) == HtmlSink.render(prnDf))
  }

  // -- CLI arg surface ----------------------------------------------

  test("CLI: validators accept case-insensitively and reject with reference messages") {
    assert(Cli.validateInputType("CSV") == "csv")
    assert(Cli.validateOutputType("Html") == "html")
    val e1 = intercept[IllegalArgumentException](Cli.validateInputType("xml"))
    assert(e1.getMessage == "Input type must be one of: csv, prn.")
    val e2 = intercept[IllegalArgumentException](Cli.validateOutputType(""))
    assert(e2.getMessage == "Output type must be one of: json, html.")
    val a = Cli.parseArgs(Seq("csv", "json", "-d", ";"))
    assert(a == Cli.Args("csv", "json", Some(";")))
  }

  test("CLI: argument errors use commander-13 phrasing and check order") {
    def msg(args: String*): String =
      intercept[IllegalArgumentException](Cli.parseArgs(args)).getMessage
    assert(msg() == "missing required argument 'inputType'")
    assert(msg("csv") == "missing required argument 'outputType'")
    // count checks run BEFORE validators: a bad value with a missing
    // second argument reports the missing argument, like commander
    assert(msg("xml") == "missing required argument 'outputType'")
    assert(msg("csv", "json", "extra") == "too many arguments. Expected 2 arguments but got 3.")
    assert(msg("xml", "json") ==
      "command-argument value 'xml' is invalid for argument 'inputType'. Input type must be one of: csv, prn.")
    assert(msg("csv", "yaml") ==
      "command-argument value 'yaml' is invalid for argument 'outputType'. Output type must be one of: json, html.")
    assert(msg("csv", "json", "--bogus") == "unknown option '--bogus'")
    assert(msg("csv", "json", "-d") == "option '-d, --csv-delimiter <char>' argument missing")
  }

  test("CLI: --help/--version short-circuit to stdout with commander-13 shapes") {
    val h = intercept[Cli.CliInfo](Cli.parseArgs(Seq("--help")))
    assert(h.code == 0)
    assert(h.text.startsWith("Usage: graft [options] <inputType> <outputType>\n"))
    assert(h.text.contains(
      "  -d, --csv-delimiter <char>  Delimiter character for CSV input (e.g., \";\",\n" +
        "                              \"\\t\"). Default is \",\".\n"))
    assert(h.text.contains("  -h, --help                  display help for command\n"))
    // help acts before argument checks: bad/missing args still get help
    assert(intercept[Cli.CliInfo](Cli.parseArgs(Seq("xml", "-h"))).code == 0)
    assert(intercept[Cli.CliInfo](Cli.parseArgs(Seq("-V"))).text == "1.0.0\n")
    // but an unknown option earlier in the scan errors first
    assert(intercept[IllegalArgumentException](
      Cli.parseArgs(Seq("--bogus", "--help"))).getMessage == "unknown option '--bogus'")
  }

  test("CLI: multi-char CSV delimiters parse like the reference's csv-parse") {
    // the reference accepts any delimiter string
    // (/root/reference/src/parsers/csvParser.ts:47); Spark 4's CSV
    // `sep` option also takes multi-char separators, so the surface
    // matches end-to-end
    val p = tmpFile("Name;;Postcode\nJohnson, John;;3732 GE\n")
    val df = CsvSource.read(spark, p, delimiter = ";;")
    val rows = JsonSink.render(df)
    assert(rows.contains(""""Name":"Johnson, John""""))
    assert(rows.contains(""""Postcode":"3732GE""""))
  }
}
