package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Canonical

/** The normalization "expression library" — the reference's five
  * per-field scalar transforms (F1–F5, SURVEY.md §2.2) re-expressed
  * as compositions of built-in Catalyst expressions, so the whole
  * normalization pass stays inside whole-stage codegen. No UDFs.
  *
  * Semantics mirror `/root/reference/src/utils/normalization.ts`:
  *  - postcode (`:46-49`): strip all whitespace, uppercase
  *  - phone (`:50-56`): digits only, a leading `+` survives
  *  - credit limit (`:57-63`): numeric prefix, `,` accepted as
  *    decimal separator, fixed 2 decimal places, unparsable → 0.00
  *  - birthday (`:64-93`): `D/M/YYYY` | `YYYYMMDD` | `YYYY-M-D` →
  *    `yyyy-MM-dd`; anything else passes through trimmed (the
  *    reference does NOT validate day/month ranges, so neither do we
  *    — `31/31/2024` becomes `2024-31-31`, not null)
  *  - text (`:94-99`): trim only
  */
object Normalize {

  /** F1 — postcode: `"4532 AA"` → `"4532AA"`. */
  def postcode(c: Column): Column =
    upper(regexp_replace(trim(c), "\\s+", ""))

  /** F2 — phone: `"+44 728 889838"` → `"+44728889838"`,
    * `"0313-398475"` → `"0313398475"`. */
  def phone(c: Column): Column = {
    val t = trim(c)
    when(t.startsWith("+"),
      concat(lit("+"), regexp_replace(t.substr(lit(2), length(t)), "[^0-9]", "")))
      .otherwise(regexp_replace(t, "[^0-9]", ""))
  }

  /** F3 — credit limit: `"54.5"` → `"54.50"`, `"1,5"` → `"1.50"`,
    * `"abc"` → `"0.00"`.
    *
    * JS `parseFloat` accepts a numeric *prefix* (`"12x"` → 12), so we
    * extract one with a regex before casting. The cast to
    * decimal(38,2) rounds HALF_UP like `toFixed(2)` does for these
    * inputs (documented divergence only at float-representation
    * boundaries — SURVEY.md §7.4 R3).
    */
  def creditLimit(c: Column): Column = {
    val t = regexp_replace(trim(c), ",", ".")
    val prefix = regexp_extract(t, "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?", 0)
    val num = when(prefix =!= "", prefix.cast(DecimalType(38, 2)))
    // parseFloat also accepts a [+-]Infinity prefix; toFixed renders it
    // verbatim (minus an explicit '+', which Number drops).
    when(t.rlike("^\\+?Infinity"), lit("Infinity"))
      .when(t.rlike("^-Infinity"), lit("-Infinity"))
      .otherwise(coalesce(num.cast("string"), lit("0.00")))
  }

  /** F4 — birthday. Pure string rebuilds (no `to_date`) because the
    * reference's regexes don't validate calendar ranges and
    * unparsable values must pass through verbatim. */
  def birthday(c: Column): Column = {
    val t = trim(c)
    val dmy = "^(\\d{1,2})/(\\d{1,2})/(\\d{4})$"
    val ymd8 = "^(\\d{4})(\\d{2})(\\d{2})$"
    val iso = "^(\\d{4})-(\\d{1,2})-(\\d{1,2})$"
    when(t.rlike(dmy),
      concat(regexp_extract(t, dmy, 3), lit("-"),
        lpad(regexp_extract(t, dmy, 2), 2, "0"), lit("-"),
        lpad(regexp_extract(t, dmy, 1), 2, "0")))
      .when(t.rlike(ymd8),
        concat(regexp_extract(t, ymd8, 1), lit("-"),
          regexp_extract(t, ymd8, 2), lit("-"),
          regexp_extract(t, ymd8, 3)))
      .when(t.rlike(iso),
        concat(regexp_extract(t, iso, 1), lit("-"),
          lpad(regexp_extract(t, iso, 2), 2, "0"), lit("-"),
          lpad(regexp_extract(t, iso, 3), 2, "0")))
      .otherwise(t)
  }

  /** F5 — Name / Address / default: trim only. */
  def text(c: Column): Column = trim(c)

  /** Normalizer for one canonical column. */
  def forHeader(header: String)(c: Column): Column = header match {
    case Canonical.Postcode    => postcode(c)
    case Canonical.Phone       => phone(c)
    case Canonical.CreditLimit => creditLimit(c)
    case Canonical.Birthday    => birthday(c)
    case _                     => text(c)
  }

  /** P1–P4 — schema alignment + normalization in one narrow
    * projection (mirrors `csvParser.ts:30-43` + `normalizeRow`):
    * case-insensitive header resolution, extra columns dropped,
    * missing columns default-filled, every kept cell normalized.
    * Null cells (empty CSV fields) take the column default.
    *
    * Input may carry [[Canonical.idxCol]]; it is preserved.
    */
  def align(df: DataFrame): DataFrame = {
    val present = df.columns
    val exprs = Canonical.headers.map { h =>
      present.find(_.trim.toLowerCase == h.toLowerCase) match {
        case Some(actual) =>
          val cell = col(s"`$actual`").cast("string")
          val normalized = forHeader(h)(cell)
          when(cell.isNull, lit(Canonical.default(h)))
            .otherwise(normalized).as(h)
        case None => lit(Canonical.default(h)).as(h)
      }
    }
    val carry =
      if (present.contains(Canonical.idxCol)) Seq(col(Canonical.idxCol)) else Nil
    df.select(exprs ++ carry: _*)
  }
}
