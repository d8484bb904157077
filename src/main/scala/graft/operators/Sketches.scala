package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic mergeable sketches over the `documents` corpus —
  * KMV distinct-count, HyperLogLog registers + estimate, and a
  * count-min frequency sketch. The reference has no sketch operators
  * (SURVEY.md §2.3); these are the driver-mandated scale extensions:
  * at 100 TB, sub-linear distinct/frequency summaries are how a
  * pipeline sizes dedup, shuffles, and vocabulary budgets without an
  * exact pass.
  *
  * Unlike `q25_sketches` (Spark's builtin HLL/KLL, gated on a
  * tolerance boolean because its internals legitimately differ from
  * DuckDB's), every sketch here is built FROM SCRATCH on md5-derived
  * integer hashes, so registers, k-th minima, and cell counters are
  * bit-identical on both engines and the gate compares them EXACTLY.
  * No libm anywhere: the HLL harmonic sum is emitted as a dyadic
  * rational scaled to integers, alpha_64 is the published rational
  * 709/1000, and error columns are integer per-mille.
  *
  * Item domain: word 3-shingles (the [[Dedup]] LSH convention,
  * including its len<3 whole-text fallback) hashed to 48 bits — the
  * first 12 hex chars of md5, extracted in the JVM kernel as the top
  * 48 of [[Dedup.md5Mod]]'s 60-bit value (`>> 12` of hex[0:15] ==
  * hex[0:12]) and in DuckDB as `substr(md5(s), 1, 12)`. ~16k distinct
  * at sf0.01 (the word vocabulary itself is only 31 strong — too
  * small to exercise any estimator).
  *
  * Scale shapes: one map-only kernel pass per query; the only
  * shuffles move 8-byte hashes (distinct / count partial-aggs), the
  * k-minima ride Spark's TakeOrderedAndProject (per-partition
  * partial top-k, k-bounded merge — exactly a KMV sketch merge), and
  * register/cell tables are bucket-bounded (64 / 3×256 rows). The
  * exact `n_exact` comparison column is itself the expensive pass
  * the sketch replaces — it is the measurement these queries exist
  * to gate (the sim_recall_report discipline), not a dependency of
  * the sketch itself.
  */
object Sketches {

  private val HashSpace = 281474976710656L // 2^48
  private val KmvK = 64
  private val HllM = 64 // 2^6 buckets; h>>6 leaves 42 bits, rho in [1,43]
  private val MersenneP = 2147483647L
  private val CmsW = 256
  private val CmsD = 3
  private val CmsTopK = 10

  /** One 48-bit hash per shingle OCCURRENCE (multiset semantics, for
    * the frequency sketch; distinct-cardinality queries dedup after).
    * Map-only kernel, pinned wide before the CPU-bound md5 loop. */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("h", LongType)))
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val ws = Text.duckWords(r.getString(1))
          Dedup.shinglesOf(ws).map(x => Row(Dedup.md5Mod(md, x, Long.MaxValue) >> 12))
        }
      }(Encoders.row(schema))
  }

  /** Distinct 48-bit shingle hashes, materialized once per query so
    * the estimate and the exact comparison count share one kernel
    * pass (checkpoint erases stats — downstream tiny crossJoins are
    * 1-row × 1-row, so no broadcast pin is needed). */
  private def distinctHashes(s: SparkSession, dir: String): DataFrame =
    shingleHashes(s, dir).dropDuplicates("h").localCheckpoint()

  /** Shared oracle CTE chain: shingles (Dedup convention) → 48-bit
    * occurrence hashes `occ` → distinct `d` (MATERIALIZED: referenced
    * by both the estimator and the exact count). */
  private val hashCtesSql: String =
    s"""${Dedup.shinglesSqlCte},
      |occ AS (SELECT ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
      |  FROM (SELECT unnest(shingles) AS s FROM sh)),
      |d AS MATERIALIZED (SELECT DISTINCT h FROM occ)""".stripMargin

  // ---------------------------------------------------------------
  // KMV (k-minimum-values) distinct estimator: keep the k smallest
  // distinct hashes; the k-th minimum h_k estimates cardinality as
  // (k-1)·H/h_k (uniform order statistics). With fewer than k
  // distinct values the sketch IS the exact set — the estimator
  // returns its size. orderBy+limit plans TakeOrderedAndProject:
  // per-partition partial top-k then a k-bounded merge, which is
  // precisely how KMV sketches merge across a 1000-executor corpus.
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val d0 = distinctHashes(s, dir)
    val kk = d0.orderBy(col("h")).limit(KmvK)
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("kc"))
    val ex = d0.agg(count(lit(1)).as("n_exact"))
    kk.crossJoin(ex)
      .select(col("kth_hash"), col("kc"), col("n_exact"),
        expr(s"CASE WHEN kc < $KmvK THEN kc" +
          s" ELSE ${KmvK - 1} * $HashSpace div kth_hash END").as("kmv_est"))
      .select(lit(KmvK.toLong).as("k"), col("kth_hash"), col("n_exact"),
        col("kmv_est"),
        expr("abs(kmv_est - n_exact) * 1000 div greatest(n_exact, 1)").as("err_pm"))
  }

  val qKmvDistinctSql: String =
    s"""WITH $hashCtesSql,
       |k AS (SELECT h FROM d ORDER BY h LIMIT $KmvK),
       |kk AS (SELECT max(h) AS kth_hash, count(*) AS kc FROM k),
       |ex AS (SELECT count(*) AS n_exact FROM d)
       |SELECT CAST($KmvK AS BIGINT) AS k, kth_hash, CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(CASE WHEN kc < $KmvK THEN kc ELSE ${KmvK - 1} * $HashSpace // kth_hash END AS BIGINT) AS kmv_est,
       |  CAST(abs(CASE WHEN kc < $KmvK THEN kc ELSE ${KmvK - 1} * $HashSpace // kth_hash END - n_exact) * 1000
       |       // greatest(n_exact, 1) AS BIGINT) AS err_pm
       |FROM kk, ex""".stripMargin

  // ---------------------------------------------------------------
  // HyperLogLog registers: bucket = h mod 64, and rho = position of
  // the highest set bit measured from the 42-bit width of the
  // remaining value (43 - bitlength, all-zero → 43). bitlength comes
  // from length(bin(x)) — Long.toBinaryString and DuckDB bin() both
  // render positive integers without leading zeros and '0' for zero,
  // so the CASE is the only zero handling needed. The register table
  // is the sketch's wire format: 64 rows, exactly comparable, and
  // mergeable across corpus shards by per-bucket max.
  private def hllRegistersFrom(s: SparkSession, d0: DataFrame): DataFrame = {
    val rr = d0
      .select((col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("wv"))
      .select(col("bucket"),
        expr("CASE WHEN wv = 0 THEN 43 ELSE 43 - length(bin(wv)) END").cast("long").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
    s.range(HllM).toDF("bucket").join(rr, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
  }

  def qHllRegisters(s: SparkSession, dir: String): DataFrame =
    hllRegistersFrom(s, distinctHashes(s, dir)).orderBy(col("bucket"))

  // ---------------------------------------------------------------
  // HLL SET ALGEBRA — the property that makes HLL the production
  // distinct sketch: two sketches built INDEPENDENTLY (here: en vs
  // non-en document shingles — two corpus shards that never meet)
  // merge by per-bucket register max into exactly the sketch of the
  // union, so a 1000-executor corpus unions 64-row wire formats
  // instead of re-scanning. Gated: per-shard estimates, the merged
  // union estimate, and the inclusion–exclusion intersection
  // (est_a + est_b − est_union — the only way an HLL answers
  // overlap), each against its exact distinct count. Same dyadic-
  // rational estimator as [[qHllEstimate]] — no libm anywhere.
  def qHllUnion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", LongType), StructField("h", LongType)))
    val hg = Tables.documents(s, dir)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("g"),
        col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val g = r.getLong(0)
          val ws = Text.duckWords(r.getString(2))
          Dedup.shinglesOf(ws).map(x => Row(g, Dedup.md5Mod(md, x, Long.MaxValue) >> 12))
        }
      }(Encoders.row(schema))
      .dropDuplicates("g", "h")
      .localCheckpoint() // feeds registers + all exact counts
    // per-shard registers (densified), then the max-merge
    val rr = hg
      .select(col("g"), (col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("wv"))
      .select(col("g"), col("bucket"),
        expr("CASE WHEN wv = 0 THEN 43 ELSE 43 - length(bin(wv)) END").cast("long").as("rho"))
      .groupBy(col("g"), col("bucket")).agg(max(col("rho")).as("register"))
    val dense = s.range(2).toDF("g")
      .crossJoin(s.range(HllM).toDF("bucket"))
      .join(rr, Seq("g", "bucket"), "left")
      .select(col("g"), col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
    val merged = dense.groupBy(col("bucket")).agg(max(col("register")).as("register"))
      .select(lit(2L).as("g"), col("bucket"), col("register")) // g=2 := union
    def estOf(regs: DataFrame): DataFrame = regs.groupBy(col("g")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - least(register, 30) AS INT))"))
        .as("denom_scaled"))
      .select(col("g"),
        expr("CAST(2904064 AS BIGINT) * CAST(1073741824 AS BIGINT) div (1000 * denom_scaled)")
          .as("est"))
    val ests = estOf(dense.unionAll(merged)) // (g, est) for 0, 1, 2
    val exacts = hg.groupBy(col("g")).agg(count(lit(1)).as("n_exact"))
      .unionAll(hg.select(col("h")).dropDuplicates("h")
        .agg(count(lit(1)).as("n_exact")).select(lit(2L).as("g"), col("n_exact")))
    val base = ests.join(exacts, "g")
    // inclusion–exclusion intersection from the three scope rows
    val ie = base.agg(
      sum(when(col("g") =!= 2L, col("est")).otherwise(-col("est"))).as("est"),
      sum(when(col("g") =!= 2L, col("n_exact")).otherwise(-col("n_exact"))).as("n_exact"))
      .select(lit(3L).as("g"), col("est"), col("n_exact"))
    base.unionAll(ie)
      .select(
        expr("CASE g WHEN 0 THEN 'rest' WHEN 1 THEN 'en' WHEN 2 THEN 'union'" +
          " ELSE 'intersect_ie' END").as("scope"),
        col("est"), col("n_exact"),
        expr("abs(est - n_exact) * 1000 div greatest(n_exact, 1)").as("err_pm"))
      .orderBy(col("scope"))
  }

  val qHllUnionSql: String =
    s"""WITH ${Dedup.shinglesSqlCte},
       |docs2 AS (SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS g, sh.shingles
       |  FROM sh JOIN documents d ON d.doc_id = sh.doc_id),
       |occ AS (SELECT g, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
       |  FROM (SELECT g, unnest(shingles) AS s FROM docs2)),
       |dd AS MATERIALIZED (SELECT DISTINCT g, h FROM occ),
       |r AS (SELECT g, h % $HllM AS bucket, h // $HllM AS wv FROM dd),
       |rr AS (SELECT g, bucket,
       |    max(CASE WHEN wv = 0 THEN 43 ELSE 43 - length(bin(wv)) END) AS register
       |  FROM r GROUP BY g, bucket),
       |b AS (SELECT gs.g, bs.bucket FROM (SELECT unnest(range(2)) AS g) gs,
       |  (SELECT unnest(range($HllM)) AS bucket) bs),
       |dense AS (SELECT b.g, b.bucket, coalesce(rr.register, 0) AS register
       |  FROM b LEFT JOIN rr USING (g, bucket)),
       |merged AS (SELECT 2 AS g, bucket, max(register) AS register
       |  FROM dense GROUP BY bucket),
       |allr AS (SELECT * FROM dense UNION ALL SELECT * FROM merged),
       |z AS (SELECT g, sum(CAST(1 AS BIGINT) << CAST(30 - least(register, 30) AS INT))
       |    AS denom_scaled FROM allr GROUP BY g),
       |est AS (SELECT g, CAST(2904064 AS BIGINT) * 1073741824 // (1000 * denom_scaled)
       |    AS est FROM z),
       |exg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact FROM dd GROUP BY g
       |  UNION ALL SELECT 2, CAST(count(DISTINCT h) AS BIGINT) FROM dd),
       |base AS (SELECT est.g, est.est, exg.n_exact FROM est JOIN exg USING (g)),
       |ie AS (SELECT 3 AS g,
       |    CAST(sum(CASE WHEN g <> 2 THEN est ELSE -est END) AS BIGINT) AS est,
       |    CAST(sum(CASE WHEN g <> 2 THEN n_exact ELSE -n_exact END) AS BIGINT) AS n_exact
       |  FROM base),
       |allrows AS (SELECT * FROM base UNION ALL SELECT * FROM ie)
       |SELECT CASE g WHEN 0 THEN 'rest' WHEN 1 THEN 'en' WHEN 2 THEN 'union'
       |    ELSE 'intersect_ie' END AS scope,
       |  CAST(est AS BIGINT) AS est, n_exact,
       |  CAST(abs(est - n_exact) * 1000 // greatest(n_exact, 1) AS BIGINT) AS err_pm
       |FROM allrows ORDER BY scope""".stripMargin

  private val hllRegistersCtesSql: String =
    s"""r AS (SELECT h % $HllM AS bucket, h // $HllM AS wv FROM d),
       |rr AS (SELECT bucket, max(CASE WHEN wv = 0 THEN 43 ELSE 43 - length(bin(wv)) END) AS register
       |  FROM r GROUP BY bucket),
       |b AS (SELECT unnest(range($HllM)) AS bucket),
       |f AS (SELECT b.bucket, coalesce(rr.register, 0) AS register
       |  FROM b LEFT JOIN rr USING (bucket))""".stripMargin

  val qHllRegistersSql: String =
    s"""WITH $hashCtesSql,
       |$hllRegistersCtesSql
       |SELECT bucket, CAST(register AS BIGINT) AS register FROM f ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  // HLL estimate from the registers, libm-free: the harmonic sum
  // Σ 2^-register is a dyadic rational, emitted scaled by 2^30
  // (registers capped at 30 for the sum — cardinalities at that
  // depth exceed the 48-bit hash space anyway); the estimate is
  // alpha_64 · m² / Z with the PUBLISHED rational alpha_64 = 0.709
  // = 709/1000, all in exact BIGINT arithmetic:
  // (709·4096·2^30) div (1000·Z_scaled) ≈ 3.1e15 — no overflow.
  // The small-range regime (HLL would switch to linear counting
  // m·ln(m/V)) needs a log, so the DECISION is emitted instead —
  // v_zero > 0 and raw estimate ≤ 5m/2 — as the gated
  // linear_regime flag; the raw estimate stays the gated value.
  def qHllEstimate(s: SparkSession, dir: String): DataFrame = {
    // ONE kernel + distinct pass feeds both the registers and the
    // exact comparison count (d0 is checkpointed by distinctHashes)
    val d0 = distinctHashes(s, dir)
    val z = hllRegistersFrom(s, d0).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - least(register, 30) AS INT))")).as("denom_scaled"),
      sum(when(col("register") === 0, 1L).otherwise(0L)).as("v_zero"))
    val ex = d0.agg(count(lit(1)).as("n_exact"))
    z.crossJoin(ex)
      .select(col("v_zero"), col("denom_scaled"), col("n_exact"),
        expr("CAST(2904064 AS BIGINT) * CAST(1073741824 AS BIGINT) div (1000 * denom_scaled)").as("hll_est"))
      .select(lit(HllM.toLong).as("m"), col("v_zero"), col("denom_scaled"),
        col("hll_est"), col("n_exact"),
        expr("abs(hll_est - n_exact) * 1000 div greatest(n_exact, 1)").as("err_pm"),
        expr(s"CAST(CASE WHEN v_zero > 0 AND hll_est <= ${5 * HllM / 2} THEN 1 ELSE 0 END AS BIGINT)")
          .as("linear_regime"))
  }

  val qHllEstimateSql: String =
    s"""WITH $hashCtesSql,
       |$hllRegistersCtesSql,
       |z AS (SELECT CAST(sum(1::BIGINT << (30 - least(register, 30))) AS BIGINT) AS denom_scaled,
       |  CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero FROM f),
       |ex AS (SELECT count(*) AS n_exact FROM d)
       |SELECT CAST($HllM AS BIGINT) AS m, v_zero, denom_scaled,
       |  CAST(2904064::BIGINT * 1073741824 // (1000 * denom_scaled) AS BIGINT) AS hll_est,
       |  CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(abs(2904064::BIGINT * 1073741824 // (1000 * denom_scaled) - n_exact) * 1000
       |       // greatest(n_exact, 1) AS BIGINT) AS err_pm,
       |  CAST(CASE WHEN v_zero > 0 AND 2904064::BIGINT * 1073741824 // (1000 * denom_scaled) <= ${5 * HllM / 2}
       |       THEN 1 ELSE 0 END AS BIGINT) AS linear_regime
       |FROM z, ex""".stripMargin

  // ---------------------------------------------------------------
  // Count-min sketch: d=3 rows × w=256 cells, row hashes from the
  // [[Dedup]] minhash mix family ((1+2k)·h + (17+k) mod P) over the
  // 48-bit item hash reduced mod P first (keeps every product far
  // below 2^63). The query gates the sketch against ground truth on
  // the items where it matters — the true top-10 heaviest shingles
  // (repeated n-grams: the memorization-risk signal) — emitting the
  // exact count, the sketch's min-over-rows estimate, and the
  // overcount. CMS never undercounts, so over_cnt ≥ 0 is also a
  // structural invariant the spec asserts. Cell table is 768 rows
  // (broadcast); counts aggregate map-side per partition exactly as
  // a sharded CMS merges (cell-wise sum).
  def qCmsHeavy(s: SparkSession, dir: String): DataFrame = {
    val wf = shingleHashes(s, dir)
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val cells = wf.crossJoin(broadcast(s.range(CmsD).toDF("k")))
      .select(col("k"),
        expr(s"((1 + 2*k) * (h % $MersenneP) + (17 + k)) % $MersenneP % $CmsW").as("cell"),
        col("cnt"))
      .groupBy(col("k"), col("cell")).agg(sum(col("cnt")).as("tot"))
    val top = wf.orderBy(col("cnt").desc, col("h")).limit(CmsTopK)
    top.join(broadcast(cells),
        expr(s"cell = ((1 + 2*k) * (h % $MersenneP) + (17 + k)) % $MersenneP % $CmsW"))
      .groupBy(col("h"), col("cnt"))
      .agg(min(col("tot")).as("cms_est"))
      .select(col("h").as("item_hash"), col("cnt").as("true_cnt"),
        col("cms_est"), (col("cms_est") - col("cnt")).as("over_cnt"))
      .orderBy(col("true_cnt").desc, col("item_hash"))
  }

  val qCmsHeavySql: String =
    s"""WITH $hashCtesSql,
       |wf AS MATERIALIZED (SELECT h, count(*) AS cnt FROM occ GROUP BY h),
       |cs AS MATERIALIZED (SELECT k, ((1 + 2*k) * (h % $MersenneP) + (17 + k)) % $MersenneP % $CmsW AS cell,
       |  CAST(sum(cnt) AS BIGINT) AS tot
       |  FROM wf, (SELECT unnest(range($CmsD)) AS k) GROUP BY k, cell),
       |top AS (SELECT h, cnt FROM wf ORDER BY cnt DESC, h LIMIT $CmsTopK)
       |SELECT t.h AS item_hash, CAST(t.cnt AS BIGINT) AS true_cnt,
       |  CAST(min(cs.tot) AS BIGINT) AS cms_est,
       |  CAST(min(cs.tot) - t.cnt AS BIGINT) AS over_cnt
       |FROM top t JOIN cs ON cs.cell = ((1 + 2*cs.k) * (t.h % $MersenneP) + (17 + cs.k)) % $MersenneP % $CmsW
       |GROUP BY t.h, t.cnt ORDER BY true_cnt DESC, item_hash""".stripMargin

  // ---------------------------------------------------------------
  // NOVELTY ATTRIBUTION — per-source share of shingles whose FIRST
  // corpus occurrence (min doc_id) lands in that source's documents:
  // the "how much genuinely new content does each feed contribute"
  // number a pipeline uses to prioritize acquisition and prune
  // recycled feeds. Per-doc shingle sets are deduplicated INSIDE the
  // kernel (per-doc HashSet — shingle sets are document-sized), so
  // the only corpus-sized shuffles are the two 8-byte-key aggregates
  // (min-doc per hash, shingles per doc); everything downstream is
  // doc-count-sized. Exact integer per-mille, no estimator. The
  // oracle keeps DuckDB's natural join-back form — same values,
  // since first occurrences partition the shingle set either way.
  private[operators] def docShingleHashes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("h", LongType)))
    Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val ws = Text.duckWords(r.getString(2))
          val seen = new java.util.HashSet[Long]()
          Dedup.shinglesOf(ws).flatMap { x =>
            val h = Dedup.md5Mod(md, x, Long.MaxValue) >> 12
            if (seen.add(h)) Some(Row(r.getLong(0), r.getString(1), h)) else None
          }
        }
      }(Encoders.row(schema))
  }

  def qNoveltySources(s: SparkSession, dir: String): DataFrame = {
    // No corpus×corpus attribution join: a shingle's first occurrence
    // is a FUNCTION of the min-doc aggregate, so per-doc novel counts
    // are just fst regrouped by its winner (measured on the 10×
    // corpus: the join-back form ran 14.7s, this shape 4× less). The
    // per-doc frames then meet in a doc-count-sized left join.
    val ds = docShingleHashes(s, dir).localCheckpoint() // one kernel pass, two consumers
    val novel = ds.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id")).agg(count(lit(1)).as("n_novel"))
    val per = ds.groupBy(col("doc_id"), col("source")).agg(count(lit(1)).as("n_sh"))
    per.join(novel, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_shingles"),
        sum(coalesce(col("n_novel"), lit(0L))).as("n_novel"))
      .select(col("source"), col("n_docs"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000 div greatest(n_shingles, 1)").as("novelty_pm"))
      .orderBy(col("source"))
  }

  val qNoveltySourcesSql: String =
    """WITH w AS (SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id, source,
      |  CASE WHEN len(ws) >= 3
      |       THEN list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
      |       ELSE [array_to_string(ws, ' ')] END AS shingles
      |  FROM w),
      |ds AS MATERIALIZED (SELECT DISTINCT doc_id, source, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
      |  FROM (SELECT doc_id, source, unnest(shingles) AS s FROM sh)),
      |fst AS (SELECT h, min(doc_id) AS first_doc FROM ds GROUP BY h),
      |per AS (SELECT d.doc_id, d.source, count(*) AS n_sh,
      |  sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS n_novel
      |  FROM ds d JOIN fst f USING (h) GROUP BY d.doc_id, d.source)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_sh) AS BIGINT) AS n_shingles, CAST(sum(n_novel) AS BIGINT) AS n_novel,
      |  CAST(sum(n_novel) * 1000 // greatest(sum(n_sh), 1) AS BIGINT) AS novelty_pm
      |FROM per GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // BLOOM FILTER + MEASURED FALSE-POSITIVE RATE — the fourth
  // canonical sketch, built from scratch like the others (the
  // engine's BloomLong expression covers the semi-join USE; this
  // gates the STRUCTURE): insert the even-doc shingle set, probe
  // with shingles appearing ONLY in odd docs (ground-truth
  // negatives by construction — the anti-join is the guarantee),
  // and gate the exact occupancy and false-positive counts. Bit
  // positions come from the CMS mix family; the "bit array" is the
  // distinct-position set, which broadcasts (≤m rows) exactly like
  // a real bloom bitmap ships to executors. The theoretical rate
  // (1−e^{−kn/m})^k needs libm, so the MEASURED rate is the gated
  // value — which is the more honest number anyway.
  private val BloomM = 65536L
  private val BloomK = 3

  def qBloomFpr(s: SparkSession, dir: String): DataFrame = {
    def posOf(kCol: String, hCol: String) =
      expr(s"((1 + 2*$kCol) * ($hCol % $MersenneP) + (17 + $kCol)) % $MersenneP % $BloomM")
    val ds = docShingleHashes(s, dir).select(col("doc_id"), col("h"))
      .localCheckpoint() // one kernel pass; even/odd splits both read it
    val ev = ds.filter(col("doc_id") % 2 === 0).select(col("h"))
      .dropDuplicates("h").localCheckpoint()
    val pr = ds.filter(col("doc_id") % 2 === 1).select(col("h"))
      .dropDuplicates("h")
      .join(ev, Seq("h"), "left_anti").localCheckpoint()
    val ks = broadcast(s.range(BloomK).toDF("k"))
    val bits = ev.crossJoin(ks).select(posOf("k", "h").as("pos"))
      .dropDuplicates("pos").localCheckpoint()
    val nFp = pr.crossJoin(ks).select(col("h"), posOf("k", "h").as("pos"))
      .join(broadcast(bits), "pos")
      .groupBy(col("h")).agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === BloomK)
      .agg(count(lit(1)).as("n_fp"))
    ev.agg(count(lit(1)).as("n_inserted"))
      .crossJoin(bits.agg(count(lit(1)).as("n_bits_set")))
      .crossJoin(pr.agg(count(lit(1)).as("n_probes")))
      .crossJoin(nFp)
      .select(lit(BloomM).as("m"), lit(BloomK.toLong).as("k"),
        col("n_inserted"), col("n_bits_set"), col("n_probes"),
        col("n_fp").as("n_false_pos"),
        expr("n_fp * 1000 div greatest(n_probes, 1)").as("fpr_pm"))
  }

  val qBloomFprSql: String =
    s"""WITH ${Dedup.shinglesSqlCte},
       |ds AS MATERIALIZED (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
       |ev AS MATERIALIZED (SELECT DISTINCT h FROM ds WHERE doc_id % 2 = 0),
       |pr AS MATERIALIZED (SELECT DISTINCT h FROM ds WHERE doc_id % 2 = 1
       |  AND h NOT IN (SELECT h FROM ev)),
       |bits AS MATERIALIZED (SELECT DISTINCT ((1 + 2*k) * (h % $MersenneP) + (17 + k)) % $MersenneP % $BloomM AS pos
       |  FROM ev, (SELECT unnest(range($BloomK)) AS k)),
       |hits AS (SELECT p.h, count(*) AS nhit
       |  FROM pr p, (SELECT unnest(range($BloomK)) AS k) kk
       |  JOIN bits b ON b.pos = ((1 + 2*kk.k) * (p.h % $MersenneP) + (17 + kk.k)) % $MersenneP % $BloomM
       |  GROUP BY p.h),
       |fp AS (SELECT count(*) AS n_fp FROM hits WHERE nhit = $BloomK)
       |SELECT CAST($BloomM AS BIGINT) AS m, CAST($BloomK AS BIGINT) AS k,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_inserted,
       |  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
       |  (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_probes,
       |  CAST(n_fp AS BIGINT) AS n_false_pos,
       |  CAST(n_fp * 1000 // greatest((SELECT count(*) FROM pr), 1) AS BIGINT) AS fpr_pm
       |FROM fp""".stripMargin

  // ---------------------------------------------------------------
  // KMV SET ALGEBRA — the sketch OPERATIONS that make sketches an
  // engine feature rather than a one-shot estimator: two corpus
  // halves (even/odd doc shingle sets — the Bloom split convention)
  // summarized as KMV sketches, then UNION and INTERSECTION
  // estimated purely from the sketches. Union: merging two KMV
  // sketches is "pool the minima, keep the k smallest" (exactly the
  // TakeOrderedAndProject merge), and the merged sketch estimates
  // |A∪B| like any KMV. Intersection: the standard ρ·|A∪B| estimator
  // where ρ = |S_k(A∪B) ∩ S_k(A) ∩ S_k(B)| / k (the theta-sketch
  // overlap rule) — integer-exact as (k_common · union_est) div k.
  // Gated against the exact counts with signed per-mille errors —
  // this is how a 100 TB pipeline estimates crawl overlap without
  // ever joining the crawls.
  def qKmvAlgebra(s: SparkSession, dir: String): DataFrame = {
    val ds = docShingleHashes(s, dir).select(col("doc_id"), col("h"))
      .localCheckpoint()
    val a = ds.filter(col("doc_id") % 2 === 0).select(col("h")).dropDuplicates("h")
      .localCheckpoint()
    val b = ds.filter(col("doc_id") % 2 === 1).select(col("h")).dropDuplicates("h")
      .localCheckpoint()
    val ka = a.orderBy(col("h")).limit(KmvK).localCheckpoint()
    val kb = b.orderBy(col("h")).limit(KmvK).localCheckpoint()
    val ku = ka.unionAll(kb).dropDuplicates("h").orderBy(col("h")).limit(KmvK)
      .localCheckpoint()
    val un = ku.agg(max(col("h")).as("kth"), count(lit(1)).as("kc"))
    val rho = ku.join(broadcast(ka), Seq("h"), "left_semi")
      .join(broadcast(kb), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("k_common"))
    val ex = a.unionAll(b).dropDuplicates("h").agg(count(lit(1)).as("union_exact"))
      .crossJoin(a.join(b, Seq("h"), "left_semi").agg(count(lit(1)).as("inter_exact")))
      .crossJoin(a.agg(count(lit(1)).as("n_a")))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
    un.crossJoin(rho).crossJoin(ex)
      .withColumn("union_est",
        expr(s"CASE WHEN kc < $KmvK THEN kc ELSE ${KmvK - 1} * $HashSpace div kth END"))
      .withColumn("inter_est", expr(s"k_common * union_est div $KmvK"))
      .select(lit(KmvK.toLong).as("k"), col("n_a"), col("n_b"),
        col("union_est"), col("union_exact"),
        expr("CASE WHEN union_est >= union_exact THEN (union_est - union_exact) * 1000 div greatest(union_exact, 1)" +
          " ELSE -((union_exact - union_est) * 1000 div greatest(union_exact, 1)) END").as("union_err_pm"),
        col("k_common"), col("inter_est"), col("inter_exact"),
        expr("CASE WHEN inter_est >= inter_exact THEN (inter_est - inter_exact) * 1000 div greatest(inter_exact, 1)" +
          " ELSE -((inter_exact - inter_est) * 1000 div greatest(inter_exact, 1)) END").as("inter_err_pm"))
  }

  val qKmvAlgebraSql: String =
    s"""WITH ${Dedup.shinglesSqlCte},
       |ds AS MATERIALIZED (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
       |a AS MATERIALIZED (SELECT DISTINCT h FROM ds WHERE doc_id % 2 = 0),
       |b AS MATERIALIZED (SELECT DISTINCT h FROM ds WHERE doc_id % 2 = 1),
       |ka AS MATERIALIZED (SELECT h FROM a ORDER BY h LIMIT $KmvK),
       |kb AS MATERIALIZED (SELECT h FROM b ORDER BY h LIMIT $KmvK),
       |ku AS MATERIALIZED (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       |  ORDER BY h LIMIT $KmvK),
       |un AS (SELECT max(h) AS kth, count(*) AS kc FROM ku),
       |rho AS (SELECT count(*) AS k_common FROM ku
       |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
       |ex AS (SELECT (SELECT count(*) FROM a) AS n_a, (SELECT count(*) FROM b) AS n_b,
       |  (SELECT count(*) FROM (SELECT h FROM a UNION SELECT h FROM b)) AS union_exact,
       |  (SELECT count(*) FROM a WHERE h IN (SELECT h FROM b)) AS inter_exact),
       |est AS (SELECT un.kc, rho.k_common, ex.*,
       |  CASE WHEN un.kc < $KmvK THEN un.kc ELSE ${KmvK - 1} * $HashSpace // un.kth END AS union_est
       |  FROM un, rho, ex)
       |SELECT CAST($KmvK AS BIGINT) AS k, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CAST(union_est AS BIGINT) AS union_est, CAST(union_exact AS BIGINT) AS union_exact,
       |  CAST(CASE WHEN union_est >= union_exact THEN (union_est - union_exact) * 1000 // greatest(union_exact, 1)
       |    ELSE -((union_exact - union_est) * 1000 // greatest(union_exact, 1)) END AS BIGINT) AS union_err_pm,
       |  CAST(k_common AS BIGINT) AS k_common,
       |  CAST(k_common * union_est // $KmvK AS BIGINT) AS inter_est,
       |  CAST(inter_exact AS BIGINT) AS inter_exact,
       |  CAST(CASE WHEN k_common * union_est // $KmvK >= inter_exact
       |    THEN (k_common * union_est // $KmvK - inter_exact) * 1000 // greatest(inter_exact, 1)
       |    ELSE -((inter_exact - k_common * union_est // $KmvK) * 1000 // greatest(inter_exact, 1)) END AS BIGINT) AS inter_err_pm
       |FROM est""".stripMargin

  // ---------------------------------------------------------------
  // MERGEABLE HISTOGRAM QUANTILE SKETCH — the fifth canonical sketch
  // (quantiles, after distinct/frequency/membership): fixed-width
  // bins over price cents (`cents div W`), per-bin counts, and
  // rank-interpolated quantile estimates — all in exact BIGINT
  // arithmetic, so unlike t-digest/KLL the sketch is deterministic
  // and the gate compares it exactly. The bin table IS the sketch's
  // wire format: it merges across corpus shards by cell-wise sum
  // (one map-side partial agg — precisely how a 1000-executor
  // quantile summary ships), and the estimate for rank r linearly
  // interpolates inside the first bin whose cumulative count reaches
  // r. The exact order statistics (distinct-value cumulative scan)
  // are the expensive pass the sketch replaces — gated alongside as
  // the measured ppm error, the [[qKmvDistinct]] discipline.
  private val QBinW = 100000L // $1000-wide bins over l_extendedprice cents
  private val QuantPms = Seq(500L, 950L, 990L)

  /** The rank-interpolation walk over a (groupCols..., bin, cnt)
    * histogram frame, SHARED by the batch sketch and the streaming
    * windowed quantiles so the estimator cannot drift between them:
    * cumulative bins per group, ceil rank r = (q·n + 999) div 1000,
    * first bin whose cumulative count reaches r, and the exact-integer
    * interpolation bin·W + W·(r − cum_before) div cnt. Returns
    * (groupCols..., q_pm, r, n_total, n_bins, bin, est) — callers
    * select/rename. All frames are bin-count × group-count metadata. */
  private[graft] def histQuantiles(
      s: SparkSession, bins: DataFrame,
      groupCols: Seq[String], binW: Long, qPms: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val w =
      if (groupCols.isEmpty) Window.orderBy(col("bin"))
      else Window.partitionBy(grp: _*).orderBy(col("bin"))
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val n = bins.groupBy(grp: _*)
      .agg(sum(col("cnt")).as("n_total"), count(lit(1)).as("n_bins"))
    import s.implicits._
    val rk = n.crossJoin(broadcast(qPms.toDF("q_pm")))
      .withColumn("r", expr("(q_pm * n_total + 999) div 1000"))
    val hit0 =
      if (groupCols.isEmpty) rk.join(broadcast(cum), col("cum") >= col("r"))
      else rk.join(cum, groupCols).filter(col("cum") >= col("r"))
    hit0
      .groupBy((grp :+ col("q_pm")) :+ col("r") :+ col("n_total") :+ col("n_bins"): _*)
      .agg(min(col("bin")).as("bin"))
      .join(
        if (groupCols.isEmpty) broadcast(cum.select(col("bin"), col("cnt"), col("cum_before")))
        else cum.select((grp :+ col("bin") :+ col("cnt") :+ col("cum_before")): _*),
        groupCols :+ "bin")
      .withColumn("est", expr(s"bin * $binW + $binW * (r - cum_before) div cnt"))
  }

  def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = Tables.lineitem(s, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
    // bin-count-bounded (~105 rows); checkpointed so the corpus scan
    // runs once for its two consumers (cumulative walk + total)
    val bins = cents.select(expr(s"cents div $QBinW").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val hit = histQuantiles(s, bins, Seq.empty, QBinW, QuantPms)
    // the exact comparison pass, CLIPPED to the hit bins (r14 verdict
    // finding 1): the exact quantile — min cents with global cumv ≥ r
    // — provably lives inside the estimator's hit bin, because the
    // hit bin is the FIRST bin with cum ≥ r, so cum_before < r ≤ cum
    // and the crossing happens inside it. Restricting the scan to
    // those ≤ |QuantPms| bins bounds the cumulative window at ≤ QBinW
    // distinct cent values per partition (Window.partitionBy(bin)),
    // at any corpus size — no unpartitioned corpus-domain WindowExec.
    // Global cumv is reconstructed as cum_before(bin) + within-bin
    // running sum, so the value gates identically to the full walk.
    val hitBins = hit.select(col("bin"), col("cum_before")).distinct()
    val dv = cents.withColumn("bin", expr(s"cents div $QBinW"))
      .join(broadcast(hitBins), Seq("bin"))
      .groupBy(col("bin"), col("cum_before"), col("cents"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cumv", col("cum_before") +
        sum(col("c")).over(Window.partitionBy(col("bin")).orderBy(col("cents"))))
    val exq = broadcast(hit.select(col("q_pm"), col("r"), col("bin")))
      .join(dv, Seq("bin"))
      .filter(col("cumv") >= col("r"))
      .groupBy(col("q_pm")).agg(min(col("cents")).as("exact_cents"))
    hit.join(exq, Seq("q_pm"))
      .select(col("q_pm"), col("r").as("rank_r"), col("n_total"), col("n_bins"),
        col("bin"), col("est").as("est_cents"), col("exact_cents"),
        expr("abs(est - exact_cents) * 1000000 div greatest(exact_cents, 1)").as("err_ppm"))
      .orderBy(col("q_pm"))
  }

  val qQuantileSketchSql: String =
    s"""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
       |bins AS MATERIALIZED (SELECT cents // $QBinW AS bin, count(*) AS cnt FROM c GROUP BY 1),
       |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total, count(*) AS n_bins FROM bins),
       |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
       |  sum(cnt) OVER (ORDER BY bin) - cnt AS cum_before FROM bins),
       |qs AS (SELECT unnest([${QuantPms.mkString(", ")}]) AS q_pm),
       |rk AS (SELECT q_pm, (q_pm * n_total + 999) // 1000 AS r, n_total, n_bins FROM qs, n),
       |hit AS (SELECT rk.q_pm, rk.r, rk.n_total, rk.n_bins, min(cum.bin) AS bin
       |  FROM rk JOIN cum ON cum.cum >= rk.r GROUP BY 1, 2, 3, 4),
       |est AS (SELECT h.q_pm, h.r, h.n_total, h.n_bins, h.bin, c2.cnt, c2.cum_before
       |  FROM hit h JOIN cum c2 ON c2.bin = h.bin),
       |dv AS (SELECT cents, count(*) AS c, sum(count(*)) OVER (ORDER BY cents) AS cumv
       |  FROM c GROUP BY cents),
       |exq AS (SELECT rk.q_pm, min(dv.cents) AS exact_cents
       |  FROM rk JOIN dv ON dv.cumv >= rk.r GROUP BY 1)
       |SELECT e.q_pm, CAST(e.r AS BIGINT) AS rank_r, e.n_total, CAST(e.n_bins AS BIGINT) AS n_bins,
       |  CAST(e.bin AS BIGINT) AS bin,
       |  CAST(e.bin * $QBinW + $QBinW * (e.r - e.cum_before) // e.cnt AS BIGINT) AS est_cents,
       |  CAST(x.exact_cents AS BIGINT) AS exact_cents,
       |  CAST(abs(e.bin * $QBinW + $QBinW * (e.r - e.cum_before) // e.cnt - x.exact_cents)
       |    * 1000000 // greatest(x.exact_cents, 1) AS BIGINT) AS err_ppm
       |FROM est e JOIN exq x USING (q_pm) ORDER BY q_pm""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_quantile" -> (qQuantileSketch _),
    "sketch_kmv_algebra" -> (qKmvAlgebra _),
    "sketch_bloom_fpr" -> (qBloomFpr _),
    "text_novelty" -> (qNoveltySources _),
    "sketch_kmv_distinct" -> (qKmvDistinct _),
    "sketch_hll_registers" -> (qHllRegisters _),
    "sketch_hll_estimate" -> (qHllEstimate _),
    "sketch_hll_union" -> (qHllUnion _),
    "sketch_cms_heavy" -> (qCmsHeavy _),
  )

  val oracles: Map[String, String] = Map(
    "sketch_quantile" -> qQuantileSketchSql,
    "sketch_kmv_algebra" -> qKmvAlgebraSql,
    "sketch_bloom_fpr" -> qBloomFprSql,
    "text_novelty" -> qNoveltySourcesSql,
    "sketch_kmv_distinct" -> qKmvDistinctSql,
    "sketch_hll_registers" -> qHllRegistersSql,
    "sketch_hll_estimate" -> qHllEstimateSql,
    "sketch_hll_union" -> qHllUnionSql,
    "sketch_cms_heavy" -> qCmsHeavySql,
  )
}
