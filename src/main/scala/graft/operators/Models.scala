package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Distributed model TRAINING as exact relational algebra — the two
  * classical fits whose sufficient statistics are integer moments,
  * so a 1000-executor training pass is nothing but a map-side
  * partial aggregation, and the learned parameters gate exactly
  * cross-engine (no gradient loops, no libm).
  *
  * The reference has no model operators (SURVEY.md §2.3); these
  * extend the LLM-pipeline layer: per-segment linear fits are the
  * heuristics-calibration workhorse (length→quality priors), and the
  * naive-Bayes count table is the classical trainable form of the
  * [[Text.qLangId]] heuristic.
  */
object Models {

  // ---------------------------------------------------------------
  // Per-source ordinary least squares, closed form. y = n_chars,
  // x = word count; the sufficient statistics (n, Σx, Σy, Σxy, Σx²)
  // are exact BIGINTs computed in ONE map-side-combined groupBy —
  // the 100 TB shape of every moment-based fit. The slope is emitted
  // as the exact integer pair (num = nΣxy−ΣxΣy, den = nΣx²−(Σx)²)
  // plus a scaled quotient. Cross-engine division discipline
  // (CLAUDE.md): Spark `div` truncates while DuckDB `//` floors, so
  // the quotient is computed sign-split — both branches feed the
  // operators non-negative values, where truncate == floor. den = 0
  // (a source whose docs all have equal word counts) is guarded with
  // greatest(den, 1) on both engines.
  def qLinregSources(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir).select(col("source"),
      size(split(lower(trim(col("text"))), "[ \t\n\f\r]+")).cast("long").as("x"),
      col("n_chars").as("y"))
    t.groupBy(col("source")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .select(col("source"), col("n"), col("num"), col("den"),
        expr("CASE WHEN num >= 0 THEN (1000 * num) div greatest(den, 1)" +
          " ELSE -((1000 * (-num)) div greatest(den, 1)) END").as("slope_x1000"))
      .orderBy(col("source"))
  }

  val qLinregSourcesSql: String =
    """WITH t AS (SELECT source, len(regexp_split_to_array(lower(trim(text)), '\s+')) AS x, n_chars AS y
      |  FROM documents),
      |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |  CAST(sum(x * x) AS BIGINT) AS sxx FROM t GROUP BY source),
      |f AS (SELECT source, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den FROM m)
      |SELECT source, n, num, den,
      |  CAST(CASE WHEN num >= 0 THEN (1000 * num) // greatest(den, 1)
      |       ELSE -((1000 * (-num)) // greatest(den, 1)) END AS BIGINT) AS slope_x1000
      |FROM f ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // Naive-Bayes trainer: class priors (docs per lang) and the top-10
  // Laplace-smoothed token conditionals per class. The corpus pass
  // is ONE (lang, word) count aggregate; totals and the vocabulary
  // size are then derived from that vocabulary-sized table, not from
  // a second corpus scan. Smoothed probabilities are emitted as
  // exact integer ppm: (cnt+1)·1e6 div (tokens_lang + |V|) — the
  // model table itself is the gated artifact (prediction needs
  // log-space accumulation, which is libm and stays out of gates).
  private val NbTopK = 10

  def qNbTrain(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cw = docs
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "[ \t\n\f\r]+")).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // vocabulary-sized; feeds ranks, totals, |V|
    val pri = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = cw.groupBy(col("lang")).agg(sum(col("cnt")).as("n_tokens"))
    val voc = cw.select(col("word")).distinct().agg(count(lit(1)).as("v"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word"))
    cw.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= NbTopK)
      .join(broadcast(pri), "lang")
      .join(broadcast(tot), "lang")
      .crossJoin(broadcast(voc))
      .select(col("lang"), col("n_docs"), col("rank"), col("word"), col("cnt"),
        expr("(cnt + 1) * 1000000 div (n_tokens + v)").as("cond_ppm"))
      .orderBy(col("lang"), col("rank"))
  }

  val qNbTrainSql: String =
    s"""WITH t AS (SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |  FROM documents),
       |cw AS MATERIALIZED (SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY lang, word),
       |pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
       |tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens FROM cw GROUP BY lang),
       |voc AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM cw),
       |rk AS (SELECT lang, word, cnt, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rank
       |  FROM cw)
       |SELECT r.lang, p.n_docs, r.rank, r.word, r.cnt,
       |  CAST((r.cnt + 1) * 1000000 // (o.n_tokens + v.v) AS BIGINT) AS cond_ppm
       |FROM rk r JOIN pri p USING (lang) JOIN tot o USING (lang) CROSS JOIN voc v
       |WHERE r.rank <= $NbTopK ORDER BY r.lang, r.rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_linreg_sources" -> (qLinregSources _),
    "ml_nb_train" -> (qNbTrain _),
  )

  val oracles: Map[String, String] = Map(
    "ml_linreg_sources" -> qLinregSourcesSql,
    "ml_nb_train" -> qNbTrainSql,
  )
}
