package graft.sources

import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.{Canonical, functions}

/** Fixed-width ("PRN") source producing the canonical 6-column frame.
  *
  * Column boundaries are inferred from the physical positions of the
  * canonical header names in the first non-blank line, exactly as the
  * reference does (`/root/reference/src/parsers/prnParser.ts:36-110`):
  * sequential `indexOf` with an advancing search offset, a warning per
  * missing header, an error when none match, specs sorted by start
  * position, each column ending where the next begins and the last
  * ending at the header line's (trimmed) length — so data lines longer
  * than the header line are truncated, like the reference's
  * `substring(start, min(end, len))` (`:116-139`).
  *
  * The header read is a driver-side O(1) peek; the data scan is a
  * distributed `spark.read.text` + one generated `substring`
  * projection, all inside whole-stage codegen. Line order is captured
  * with `zipWithIndex` so sinks can render in file order.
  *
  * Spark's text source decodes UTF-8 only, so non-UTF-8 input (the
  * reference's latin1) is transcoded driver-side to a temp file first
  * (SURVEY.md §7.4 R1) — character offsets are unaffected because the
  * reference indexes decoded characters too.
  */
object PrnSource {

  final case class ColumnSpec(name: String, start: Int, end: Int)

  /** Mirrors `processHeaderLine` (`prnParser.ts:36-110`).
    * @return specs sorted by start position (possibly fewer than 6)
    * @throws IllegalArgumentException when no header matches */
  def inferSpecs(headerLine: String, warn: String => Unit = System.err.println): Seq[ColumnSpec] = {
    val trimmed = headerLine.replaceAll("\\s+$", "") // trimEnd: keep leading spaces for indexOf
    var found = Vector.empty[(String, Int)]
    var offset = 0
    for (h <- Canonical.headers) {
      val i = trimmed.indexOf(h, offset)
      if (i >= 0) {
        found :+= (h, i)
        offset = i + 1
      } else {
        warn(s"""PRN Parser Warning: Expected header "$h" not found in header line: "$trimmed" (searched from index ${offset - 1}).""")
      }
    }
    val sorted = found.sortBy(_._2)
    val specs = sorted.zipWithIndex.map { case ((name, start), i) =>
      val end = if (i < sorted.length - 1) sorted(i + 1)._2 else trimmed.length
      ColumnSpec(name, start, end)
    }
    if (specs.isEmpty && trimmed.nonEmpty)
      throw new IllegalArgumentException(
        "PRN Error: Could not derive any column specifications from PRN header line. Ensure headers match EXPECTED_HEADERS.")
    if (specs.nonEmpty && specs.length < Canonical.headers.length) {
      val missing = Canonical.headers.filterNot(h => specs.exists(_.name == h))
      if (missing.nonEmpty)
        warn(s"Not all EXPECTED_HEADERS were found or mapped. Missing/unmapped: ${missing.mkString(", ")}")
    }
    specs
  }

  def read(
      spark: SparkSession,
      path: String,
      encoding: String = "ISO-8859-1",
      warn: String => Unit = System.err.println): DataFrame = {

    val utf8Path = ensureUtf8(path, encoding)

    // Driver-side peek: index + text of the first non-blank line.
    val header = firstNonBlankLine(utf8Path)
    header match {
      case None => CsvSource.empty(spark) // no header anywhere → 0 rows
      case Some((headerIdx, headerLine)) =>
        val specs = inferSpecs(headerLine, warn)
        // Distributed scan with stable line numbering; drop everything
        // up to and including the header line, and blank lines.
        val lineSchema = StructType(Seq(
          StructField("value", StringType), StructField(Canonical.idxCol, LongType)))
        val lines = spark.createDataFrame(
          spark.read.textFile(utf8Path).rdd.zipWithIndex()
            .map { case (l, i) => Row(l, i) },
          lineSchema)
        val data = lines
          .filter(col(Canonical.idxCol) > headerIdx && trim(col("value")) =!= "")
        val cols: Seq[Column] = specs.map { spec =>
          val slice = trim(substring(col("value"), spec.start + 1, spec.end - spec.start))
          val v =
            if (spec.name == Canonical.CreditLimit) centsToUnits(slice)
            else slice
          v.as(spec.name)
        }
        functions.Normalize.align(
          data.select(cols :+ col(Canonical.idxCol): _*))
    }
  }

  /** PRN stores Credit Limit as integer cents; mirror of
    * `prnParser.ts:130-137`: `parseInt` (numeric prefix, like JS),
    * divide by 100 at 2 decimal places, non-numeric → "" (which the
    * normalizer then defaults to 0.00). Exact: integer cents / 100 at
    * scale 2 has no rounding. */
  private def centsToUnits(v: Column): Column = {
    val intPrefix = regexp_extract(v, "^[+-]?\\d+", 0)
    when(intPrefix =!= "",
      (intPrefix.cast("decimal(38,0)") / 100).cast("decimal(38,2)").cast("string"))
      .otherwise(lit(""))
  }

  private def firstNonBlankLine(path: String): Option[(Long, String)] = {
    val it = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
    try {
      it.iterator.asScala.zipWithIndex
        .find { case (l, _) => l.trim.nonEmpty }
        .map { case (l, i) => (i.toLong, l) }
    } finally it.close()
  }

  private def ensureUtf8(path: String, encoding: String): String = {
    val cs = Charset.forName(encoding)
    if (cs == StandardCharsets.UTF_8 || cs == StandardCharsets.US_ASCII) path
    else {
      val text = new String(Files.readAllBytes(Paths.get(path)), cs)
      val tmp = Files.createTempFile("graft_prn_", ".txt")
      tmp.toFile.deleteOnExit()
      Files.write(tmp, text.getBytes(StandardCharsets.UTF_8), StandardOpenOption.TRUNCATE_EXISTING)
      tmp.toString
    }
  }
}
