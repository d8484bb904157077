package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.SinkRegistry
import graft.sources.SourceRegistry

/** CLI entry: `<inputType> <outputType> [-d <delimiter>]`, stdin →
  * stdout, mirroring the reference's surface
  * (`/root/reference/src/index.ts:105-148`): case-insensitive
  * whitelist validation with the same error strings, latin1 stdin
  * decoding, progress lines on stderr only (stdout stays pure data so
  * the cross-format `diff` acceptance check holds), exit 1 on any
  * failure, and a DEBUG-gated stderr logger.
  *
  * Spark sources are path-based, so stdin is spooled to a temp file
  * (transcoded latin1 → UTF-8, see SURVEY.md §7.4 R1) before the
  * job runs.
  */
object Cli {

  private val AllowedInputs = Seq("csv", "prn")
  private val AllowedOutputs = Seq("json", "html")

  private lazy val isDebug = sys.env.get("DEBUG").exists(v => v != "false" && v != "0" && v.nonEmpty)
  private def debugLog(msg: => String): Unit = if (isDebug) System.err.println(s"DEBUG: $msg")

  def validateInputType(v: String): String = {
    val lower = v.toLowerCase
    if (AllowedInputs.contains(lower)) lower
    else throw new IllegalArgumentException(s"Input type must be one of: ${AllowedInputs.mkString(", ")}.")
  }

  def validateOutputType(v: String): String = {
    val lower = v.toLowerCase
    if (AllowedOutputs.contains(lower)) lower
    else throw new IllegalArgumentException(s"Output type must be one of: ${AllowedOutputs.mkString(", ")}.")
  }

  final case class Args(inputType: String, outputType: String, csvDelimiter: Option[String])

  /** Raised when an option short-circuits the run (help/version):
    * `text` goes to STDOUT (commander prints both there) and the
    * process exits with `code` (0). */
  final case class CliInfo(text: String, code: Int) extends RuntimeException(text)

  /** Commander-13 `--help` output for the reference's program
    * definition (`/root/reference/src/index.ts:105-121`: version
    * 1.0.0, description, two documented arguments, the -d option,
    * plus commander's implicit -V/-h rows), laid out with commander's
    * formatHelp geometry: 2-space item indent, terms padded to the
    * longest term (26 cols here) + 2 separator spaces, descriptions
    * wrapped at helpWidth 80 with a hanging indent to column 30. The
    * program name slot shows this binary's name (commander derives it
    * from the invoked script, so the reference's is install-dependent;
    * it has no `bin` entry to pin one). */
  val helpText: String =
    """Usage: graft [options] <inputType> <outputType>
      |
      |A command line utility to transform CSV or PRN data from stdin to JSON or HTML
      |on stdout.
      |
      |Arguments:
      |  inputType                   Input data format (csv or prn)
      |  outputType                  Output data format (json or html)
      |
      |Options:
      |  -V, --version               output the version number
      |  -d, --csv-delimiter <char>  Delimiter character for CSV input (e.g., ";",
      |                              "\t"). Default is ",".
      |  -h, --help                  display help for command
      |""".stripMargin

  val versionText: String = "1.0.0"

  /** Parses `<inputType> <outputType> [-d|--csv-delimiter <char>]`.
    *
    * Error phrasing and check ORDER mirror commander 13 (the
    * reference's parser, `/root/reference/src/index.ts:105-121` with
    * `commander ^13.1.0`): unknown options fail during the option
    * scan; then argument-count checks run (missing first, then
    * excess) BEFORE any value validator; an invalid value surfaces
    * wrapped as `command-argument value '<v>' is invalid for argument
    * '<name>'. <validator message>`. The `error: ` prefix is added by
    * [[main]], as commander does when printing. */
  def parseArgs(argv: Seq[String]): Args = {
    var positional = Vector.empty[String]
    var delimiter: Option[String] = None
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "-d" | "--csv-delimiter" =>
          if (i + 1 >= argv.length)
            throw new IllegalArgumentException("option '-d, --csv-delimiter <char>' argument missing")
          delimiter = Some(argv(i + 1)); i += 2
        // help/version act WHERE ENCOUNTERED in the left-to-right
        // option scan, before any argument-count check — commander's
        // order: `--help` with no arguments shows help (exit 0), but
        // an unknown option EARLIER in argv still errors first
        case "-h" | "--help" => throw CliInfo(helpText, 0)
        case "-V" | "--version" => throw CliInfo(versionText + "\n", 0)
        case flag if flag.startsWith("-") && flag.length > 1 =>
          throw new IllegalArgumentException(s"unknown option '$flag'")
        case p => positional :+= p; i += 1
      }
    }
    Seq("inputType", "outputType").zipWithIndex.foreach { case (name, idx) =>
      if (positional.length <= idx)
        throw new IllegalArgumentException(s"missing required argument '$name'")
    }
    if (positional.length > 2)
      throw new IllegalArgumentException(
        s"too many arguments. Expected 2 arguments but got ${positional.length}.")
    def checked(name: String, value: String, f: String => String): String =
      try f(value)
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"command-argument value '$value' is invalid for argument '$name'. ${e.getMessage}")
      }
    Args(
      checked("inputType", positional(0), validateInputType),
      checked("outputType", positional(1), validateOutputType),
      delimiter)
  }

  /** The data plane: scan → normalize (executors) → render (driver),
    * resolved through the registries (mirrors the reference's
    * createParser/createRenderer factories). */
  def convert(spark: SparkSession, args: Args, inputPath: String, inputIsUtf8: Boolean): String = {
    val encoding = if (inputIsUtf8) "UTF-8" else "ISO-8859-1"
    val opts = SourceRegistry.SourceOptions(args.csvDelimiter.getOrElse(","), encoding)
    val df: DataFrame = SourceRegistry(args.inputType)(spark, inputPath, opts)
    SinkRegistry(args.outputType)(df)
  }

  def main(argv: Array[String]): Unit = {
    val args =
      try parseArgs(argv.toIndexedSeq)
      catch {
        case CliInfo(text, code) =>
          System.out.print(text)
          System.out.flush()
          sys.exit(code)
        case e: IllegalArgumentException =>
          System.err.println(s"error: ${e.getMessage}")
          sys.exit(1)
      }

    debugLog(s"Parsed args: $args")
    // Spool stdin (latin1 bytes, like the reference's
    // setEncoding('latin1')) to a UTF-8 temp file for the path-based
    // Spark sources.
    val raw = System.in.readAllBytes()
    val text = new String(raw, StandardCharsets.ISO_8859_1)
    val tmp = Files.createTempFile("graft_stdin_", ".txt")
    tmp.toFile.deleteOnExit()
    Files.write(tmp, text.getBytes(StandardCharsets.UTF_8))
    debugLog(s"Spooled ${raw.length} bytes of stdin to $tmp")

    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_MASTER", "local[*]"), 32)
      .appName("graft-cli")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try {
      System.err.println(s"Processing ${args.inputType} to ${args.outputType}...")
      val out = convert(spark, args, tmp.toString, inputIsUtf8 = true)
      // Write raw UTF-8 bytes: PrintStream would transcode through the
      // platform console charset (ASCII in a bare container locale)
      // and mangle non-ASCII — output must be valid UTF-8 regardless
      // of locale (reference README.md:31-33).
      System.out.write(out.getBytes(StandardCharsets.UTF_8))
      System.out.flush()
      System.err.println("Processing complete.")
    } catch {
      case e: Throwable =>
        System.err.println("\nAn error occurred during processing:")
        System.err.println(userMessage(args.inputType, e))
        if (isDebug) e.printStackTrace()
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }

  /** Mirrors the reference's error channel (`csvParser.ts:55-57`):
    * parse failures surface as `CSV parsing error: <cause>`. Spark
    * wraps the malformed-record cause in FAILED_READ_FILE layers, so
    * walk the cause chain for the parse-level message. */
  private def userMessage(inputType: String, e: Throwable): String = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val msg = e.getMessage
    if (msg != null && msg.startsWith("CSV parsing error")) msg
    else chain.reverse.find { c =>
      val m = c.getMessage
      m != null && (m.contains("MALFORMED_CSV_RECORD") || m.contains("MALFORMED_RECORD_IN_PARSING"))
    } match {
      case Some(cause) if inputType == "csv" => s"CSV parsing error: ${cause.getMessage}"
      case _ => msg
    }
  }
}
