package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents` / `embeddings` — exact
  * (hash-groupBy), MinHash+LSH near-dup, SimHash, n-gram Jaccard
  * verification, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - Exact dedup is a map-side md5 + one hash aggregate — the
  *    canonical "shuffle only the 16-byte digest" shape.
  *  - MinHash signatures are computed per document in one projection
  *    (no shuffle); LSH banding explodes to (band, hash) keys so the
  *    candidate join shuffles only band digests, never text. The
  *    expensive exact-Jaccard verification runs only on LSH
  *    candidates, which is the entire point of LSH: all-pairs never
  *    materializes.
  *  - SimHash is again map-only per document; near-dup lookup at
  *    scale is a groupBy on the 16-bit key (or a band of it).
  *  - Embedding cosine here is the brute-force verifier; the scale
  *    path is the LSH-bucketed variant in [[Similarity]].
  *
  * The MinHash family uses md5-keyed "permutations"
  * (min over md5(k || shingle) per k) so the DuckDB oracle can
  * reproduce signatures exactly — both engines agree on md5 and on
  * lexicographic ordering of lowercase hex strings.
  */
object Dedup {

  private val NumHashes = 12
  private val BandSize = 2 // 6 bands of 2 hashes -> catches jaccard >~ 0.3 pairs reliably
  private val NumBands = NumHashes / BandSize
  private val JaccardThreshold = 0.1
  private val CosineThreshold = 0.45

  /** Driver-map cutover for [[qEmbedCosine]]'s pair scoring: up to
    * this many corpus vectors the per-doc (v, nrm) table is collected
    * into one primitive HashMap and closure-broadcast (~1 KB/vector
    * at dim 64 → ≤ ~256 MB, measured ~10× cheaper than UnsafeRow
    * DataFrame broadcasts at the gate SFs); beyond it the driver heap
    * is the cliff, so scoring fetch-joins the materialized signatures
    * table instead. Overridable (system property) so the spec and the
    * 10× sweep can force the join form at small SF. */
  private[operators] def embedBroadcastMaxVectors: Long =
    sys.props.get("graft.embed.broadcastMaxVectors").map(_.toLong).getOrElse(250000L)

  /** Word 3-shingles with the len<3 whole-text fallback — THE
    * shingle convention every LSH/sketch/novelty consumer mirrors
    * (JVM twin of [[shinglesSqlCte]]; keep the two in lockstep). */
  private[operators] def shinglesOf(ws: Array[String]): Iterator[String] =
    if (ws.length >= 3)
      (0 to ws.length - 3).iterator.map(i => ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
    else Iterator(ws.mkString(" "))

  /** The memoized word-shingle signature base, exposed to
    * [[Text.qBoilerplate]] (the same memo the LSH family shares —
    * one shingle kernel pass per corpus). */
  private[operators] def wordBase(s: SparkSession, dir: String): DataFrame =
    memoBase("word", s, dir)(wordSignatures(s, dir))

  private[operators] val shinglesSqlCte =
    """w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(ws) >= 3
      |       THEN list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
      |       ELSE [array_to_string(ws, ' ')] END AS shingles
      |  FROM w)""".stripMargin

  // ---------------------------------------------------------------
  // exact dedup: md5-groupBy summary. Only digests shuffle.
  def qExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(col("text")).as("h"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dup_docs"))

  val qExactSql: String =
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct,
      |  count(*) - count(DISTINCT md5(text)) AS n_dup_docs
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------
  // MinHash + LSH near-dup: signature -> bands -> candidate pairs ->
  // exact-Jaccard verification of candidates only.
  //
  // Each shingle is digested ONCE (md5 -> 60-bit int); the 12
  // "permutations" are then integer mixes (a_k·h + b_k mod p,
  // p = 2^31-1) of that digest. The naive per-permutation md5
  // formulation cost 12 digests per shingle and measured 33s per
  // pass at sf0.1; this form is one digest + trivial int math.
  // Bands carry only (doc_id, band_id, two ints): the candidate join
  // shuffles fixed-width keys, never text. The per-doc intermediates
  // (shingle sets, band keys) are persisted because both sides of the
  // self-join and the verification join need them — at 100 TB this
  // materialization is a signatures table, not a recompute.
  private val MersenneP = 2147483647L // 2^31 - 1

  /** Shared JVM-side digest: first 15 md5 hex chars -> 60-bit int,
    * reduced mod p. Identical to `conv(substring(md5(x),1,15),16,10)
    * % p` and to DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT % p`. */
  private[operators] def md5Mod(md: java.security.MessageDigest, s: String, p: Long): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xfL)
    h % p
  }

  /** Per-partition word-shingle signature kernel: (doc_id, sset,
    * 12-min signature) in tight loops. Same arithmetic as the HOF
    * form (minima are order-independent), ~10x less per-element
    * overhead. */
  private def wordSignatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sset", ArrayType(StringType)),
      StructField("sig", ArrayType(LongType))))
    val (p, nHashes) = (MersenneP, NumHashes)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // the test corpus is one small parquet file -> ~3 scan
      // partitions; hash-repartitioning the (tiny) raw text decouples
      // the CPU-bound kernel's parallelism from file layout. The
      // partition count MUST be explicit: repartition(col) alone is an
      // AQE-coalescible exchange, and with ~1 MB of raw text AQE
      // collapses it to ONE partition, single-threading the kernel
      // (measured: the checkpoint stage ran 1 task / 3.4s until pinned)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val ws = Text.duckWords(r.getString(1))
          val sset: Array[String] = shinglesOf(ws).toArray.distinct
          val sig = Array.fill(nHashes)(Long.MaxValue)
          sset.foreach { sh =>
            val h = md5Mod(md, sh, p)
            var k = 0
            while (k < nHashes) {
              val m = ((1L + 2L * k) * h + (17L + k)) % p
              if (m < sig(k)) sig(k) = m
              k += 1
            }
          }
          Row(id, sset, sig)
        }
      }(Encoders.row(schema))
  }

  /** Fixed-width (band_id, h1, h2) struct keys over a `sig` column,
    * for the same measured reasons documented in [[qNgramJaccard]];
    * the candidate set is identical to the string-key form the oracle
    * builds, so the oracle is unaffected. */
  private def bandKeyStructs: Column = array((0 until NumBands).map { b =>
    struct(lit(b).as("band_id"),
      element_at(col("sig"), b * BandSize + 1).as("h1"),
      element_at(col("sig"), b * BandSize + 2).as("h2"))
  }: _*)

  def qMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    // Eager localCheckpoint via the per-family base memo:
    // materializes the signature pass once for all downstream
    // consumers (both band sides + the verification attach) AND
    // leaves nothing registered in the session's catalog cache — the
    // library contract is that queries do not accrue cached relations
    // a caller must clearCache() (checkpoint blocks are freed on memo
    // replacement or resetMemos()).
    val base = memoBase("word", s, dir)(wordSignatures(s, dir))
    val bands = base.select(col("doc_id"), explode(bandKeyStructs).as("bk"))
    val cand = bands.select(col("bk"), col("doc_id").as("doc_a"))
      .join(bands.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val sets = base.select(col("doc_id"), col("sset"))
    val jac = size(array_intersect(col("sset_a"), col("sset_b"))).cast("double") /
      size(array_union(col("sset_a"), col("sset_b")))
    // The shingle-set table is tiny relative to the candidate-pair
    // frame with sets attached (per-DOC sets vs per-PAIR copies), so
    // the sets side is the explicit broadcast BUILD side: candidates
    // stream through two broadcast hash joins and the per-pair
    // set-copies never hit a shuffle (see [[qNgramJaccard]] for the
    // measured numbers at sf0.1).
    cand
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("sset").as("sset_a"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("sset").as("sset_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jac"))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------
  // MINHASH ESTIMATOR QUALITY — the sketch-audit for the signature
  // itself: over the LSH candidate pairs, the Jaccard ESTIMATE the
  // 12-hash signature implies (matching-coordinate fraction — the
  // property the whole MinHash construction rests on:
  // P[min_k(A) = min_k(B)] = J(A,B)) against the exact set Jaccard,
  // gated as integer per-mille with the signed error. This is the
  // measurement that justifies NumHashes=12 and the banding
  // thresholds: the audit row shows how coarse a 12-sample estimate
  // is (quantized to twelfths), which is exactly why the pipelines
  // VERIFY candidates exactly instead of trusting the signature —
  // and the same number a 100 TB deployment reads before spending
  // memory on wider signatures. One signature-base pass (shared
  // memo), candidate generation unchanged, a 12-term codegen'd
  // compare chain per pair; fixed-width rows only.
  def qMinhashEst(s: SparkSession, dir: String): DataFrame = {
    val base = memoBase("word", s, dir)(wordSignatures(s, dir))
    val bands = base.select(col("doc_id"), explode(bandKeyStructs).as("bk"))
    val cand = bands.select(col("bk"), col("doc_id").as("doc_a"))
      .join(bands.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val matches = (0 until NumHashes).map(k =>
      when(element_at(col("sig_a"), k + 1) === element_at(col("sig_b"), k + 1), 1L)
        .otherwise(0L)).reduce(_ + _)
    val docSide = base.select(col("doc_id"), col("sset"), col("sig"))
    cand
      .join(broadcast(docSide.select(col("doc_id").as("doc_a"),
        col("sset").as("sset_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(docSide.select(col("doc_id").as("doc_b"),
        col("sset").as("sset_b"), col("sig").as("sig_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        matches.as("n_match"),
        expr("cast(size(array_intersect(sset_a, sset_b)) as bigint) * 1000 div " +
          "cast(size(array_union(sset_a, sset_b)) as bigint)").as("jac_pm"))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        expr(s"n_match * 1000 div $NumHashes").as("est_pm"), col("jac_pm"),
        (expr(s"n_match * 1000 div $NumHashes") - col("jac_pm")).as("err_pm"))
      // audit-sized; checkpointed before the sort — the final
      // orderBy's range exchange would otherwise sample-run the
      // candidate-join + verify chain twice (the winnow-pairs rule)
      .localCheckpoint()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------
  // b-BIT MINHASH — the storage-compressed estimator tier (Li &
  // König, "b-Bit Minwise Hashing", WWW 2010): store only the low b
  // bits of each minhash (8× smaller signatures at b=4 vs 32-bit
  // values), pay for it with random collisions, and correct them in
  // closed form: E[match] = J + (1−J)/2^b, so
  // Ĵ = (m·2^b − k)/(k·(2^b − 1)), clamped at 0 BEFORE the division
  // (a negative numerator would hit the truncate-vs-floor engine
  // split). Gated next to the full-width estimate AND the exact
  // Jaccard on the same candidate pairs, so the table shows the
  // compression trade directly. Scale shape: identical to
  // [[qMinhashEst]] (memoized signatures, banded candidates,
  // broadcast per-doc fetch); the b-bit match count is 12 row-local
  // integer compares.
  private val BbitBits = 4

  def qMinhashBbit(s: SparkSession, dir: String): DataFrame = {
    val base = memoBase("word", s, dir)(wordSignatures(s, dir))
    val bands = base.select(col("doc_id"), explode(bandKeyStructs).as("bk"))
    val cand = bands.select(col("bk"), col("doc_id").as("doc_a"))
      .join(bands.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val twoB = 1L << BbitBits
    val matchesFull = (0 until NumHashes).map(k =>
      when(element_at(col("sig_a"), k + 1) === element_at(col("sig_b"), k + 1), 1L)
        .otherwise(0L)).reduce(_ + _)
    val matchesB = (0 until NumHashes).map(k =>
      when(element_at(col("sig_a"), k + 1) % twoB === element_at(col("sig_b"), k + 1) % twoB, 1L)
        .otherwise(0L)).reduce(_ + _)
    val docSide = base.select(col("doc_id"), col("sset"), col("sig"))
    cand
      .join(broadcast(docSide.select(col("doc_id").as("doc_a"),
        col("sset").as("sset_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(docSide.select(col("doc_id").as("doc_b"),
        col("sset").as("sset_b"), col("sig").as("sig_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        matchesFull.as("n_match"), matchesB.as("n_match_b"),
        expr("cast(size(array_intersect(sset_a, sset_b)) as bigint) * 1000 div " +
          "cast(size(array_union(sset_a, sset_b)) as bigint)").as("jac_pm"))
      .select(col("doc_a"), col("doc_b"), col("n_match"), col("n_match_b"),
        expr(s"n_match * 1000 div $NumHashes").as("est_full_pm"),
        expr(s"1000 * greatest(n_match_b * $twoB - $NumHashes, 0)" +
          s" div (${NumHashes}L * ${twoB - 1})").as("est_b_pm"),
        col("jac_pm"))
      .withColumn("err_b_pm", col("est_b_pm") - col("jac_pm"))
      .localCheckpoint() // audit-sized; the winnow-pairs sort rule
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared oracle CTE chain (shingles → minhash signatures → band
    * keys → distinct candidate pairs) embedded verbatim by
    * [[qMinhashEstSql]] and [[qMinhashBbitSql]] — factored like
    * [[shinglesSqlCte]] (r13 advice) so neither oracle derives from
    * the other by split/replace surgery that silently no-ops when
    * the base text drifts. Ends at `cand`; each consumer writes its
    * own verify CTE (`j`) and final SELECT. */
  private lazy val minhashCandSqlCtes: String =
    s"""$shinglesSqlCte,
       |hv AS (SELECT doc_id,
       |  list_transform(shingles, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $MersenneP) AS hv,
       |  list_distinct(shingles) AS sset
       |  FROM sh),
       |mh AS MATERIALIZED (SELECT doc_id, sset,
       |  list_transform(range($NumHashes),
       |    k -> list_aggregate(list_transform(hv, h -> ((1 + k * 2) * h + (17 + k)) % $MersenneP), 'min')) AS sig
       |  FROM hv),
       |bands AS (SELECT doc_id,
       |  CAST(b AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 1] AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 2] AS VARCHAR) AS band_key
       |  FROM mh, (SELECT unnest(range($NumBands)) AS b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin

  lazy val qMinhashBbitSql: String = {
    val twoB = 1L << BbitBits
    s"""WITH $minhashCandSqlCtes,
       |j AS (SELECT doc_a, doc_b,
       |  len(list_filter(range($NumHashes), k -> sa.sig[k+1] = sb.sig[k+1])) AS n_match,
       |  len(list_filter(range($NumHashes), k -> sa.sig[k+1] % $twoB = sb.sig[k+1] % $twoB)) AS n_match_b,
       |  len(list_intersect(sa.sset, sb.sset)) * 1000 // len(list_distinct(sa.sset || sb.sset)) AS jac_pm
       |  FROM cand JOIN mh sa ON cand.doc_a = sa.doc_id JOIN mh sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, CAST(n_match AS BIGINT) AS n_match,
       |  CAST(n_match_b AS BIGINT) AS n_match_b,
       |  CAST(n_match * 1000 // $NumHashes AS BIGINT) AS est_full_pm,
       |  CAST(1000 * greatest(n_match_b * $twoB - $NumHashes, 0)
       |    // ($NumHashes * ${twoB - 1}) AS BIGINT) AS est_b_pm,
       |  CAST(jac_pm AS BIGINT) AS jac_pm,
       |  CAST(1000 * greatest(n_match_b * $twoB - $NumHashes, 0)
       |    // ($NumHashes * ${twoB - 1}) - jac_pm AS BIGINT) AS err_b_pm
       |FROM j ORDER BY doc_a, doc_b""".stripMargin
  }

  lazy val qMinhashEstSql: String =
    s"""WITH $minhashCandSqlCtes,
       |j AS (SELECT doc_a, doc_b,
       |  len(list_filter(range($NumHashes), k -> sa.sig[k+1] = sb.sig[k+1])) AS n_match,
       |  len(list_intersect(sa.sset, sb.sset)) * 1000 // len(list_distinct(sa.sset || sb.sset)) AS jac_pm
       |  FROM cand JOIN mh sa ON cand.doc_a = sa.doc_id JOIN mh sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, CAST(n_match AS BIGINT) AS n_match,
       |  CAST(n_match * 1000 // $NumHashes AS BIGINT) AS est_pm,
       |  CAST(jac_pm AS BIGINT) AS jac_pm,
       |  CAST(n_match * 1000 // $NumHashes - jac_pm AS BIGINT) AS err_pm
       |FROM j ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // MinHash LSH with a BUCKET-SIZE CAP — the production guard the
  // round-6 10× duplication-stress profile motivates (PLANS.md):
  // LSH pair count is Σ bucket², so one boilerplate/template cluster
  // of b docs costs b² pairs regardless of banding — the
  // prefix-perturbed 10× corpus measured a 1.46 GB pair exchange and
  // a 29× slowdown from exactly this. Production near-dup pipelines
  // (and every LSH library's `maxBucketSize`) skip buckets above a
  // cap before pair generation: a bucket that large is evidence of
  // boilerplate better handled by exact dedup upstream, and the pair
  // loss is bounded — a TRUE near-dup pair colliding in a capped
  // bucket usually also collides in another, smaller band bucket
  // (that's why bands exist). Bucket sizes attach via
  // count-over-Window on the band key so the sizing and the
  // self-join share one exchange (the qSubstring rule), and the
  // verify stage is [[qMinHashLsh]]'s broadcast shape unchanged.
  private val LshBucketCap = 4

  def qMinHashCapped(s: SparkSession, dir: String): DataFrame = {
    val base = memoBase("word", s, dir)(wordSignatures(s, dir))
    val bands = base.select(col("doc_id"), explode(bandKeyStructs).as("bk"))
    val kept = bands
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
      .filter(col("bsz") <= LshBucketCap)
      .select(col("bk"), col("doc_id"))
    val cand = kept.select(col("bk"), col("doc_id").as("doc_a"))
      .join(kept.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val sets = base.select(col("doc_id"), col("sset"))
    val jac = size(array_intersect(col("sset_a"), col("sset_b"))).cast("double") /
      size(array_union(col("sset_a"), col("sset_b")))
    cand
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("sset").as("sset_a"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("sset").as("sset_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jac"))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------
  // CAP-RECALL AUDIT — the bucket-size cap's pair loss MEASURED as a
  // gated value (the sim_recall_report discipline pointed at dedup):
  // the capped pair list vs the uncapped ground truth, as exact
  // integer counts and per-mille recall. This is the number that
  // justifies (or vetoes) running the capped variant in production —
  // Scaladoc recall claims become regression-visible. Costs two
  // banded pipelines (both Σbucket²-bounded); the uncapped twin is
  // safe to use as truth HERE because word-shingle buckets are small
  // at this corpus shape — unlike winnow's df-capped index, whose
  // uncapped form is the measured 24s quadratic and stays unmeasured.
  def qCapRecall(s: SparkSession, dir: String): DataFrame = {
    val un = qMinHashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val cap = qMinHashCapped(s, dir)
      .select(col("doc_a").as("ca"), col("doc_b").as("cb"))
    val nUn = un.agg(count(lit(1)).as("n_uncapped"))
    val nCap = cap.agg(count(lit(1)).as("n_capped"))
    val nCommon = un
      .join(cap, col("doc_a") === col("ca") && col("doc_b") === col("cb"))
      .agg(count(lit(1)).as("n_common"))
    // greatest(..., 1): a zero uncapped pair list (possible at other
    // corpus shapes) must yield recall 0, not NULL here / a DuckDB
    // division error in the oracle — guarded identically both sides
    nUn.crossJoin(nCap).crossJoin(nCommon)
      .select(col("n_uncapped"), col("n_capped"), col("n_common"),
        expr("n_common * 1000 div greatest(n_uncapped, 1)").as("recall_pm"))
  }

  lazy val qCapRecallSql: String =
    // composed without stripMargin: the embedded SQL carries `||`
    // continuation lines an outer margin strip would corrupt.
    // un/cap are MATERIALIZED: each is referenced twice (count +
    // join), and DuckDB inlines plain CTEs — re-running both full
    // MinHash pipelines ~3x. greatest(..., 1) mirrors the Spark
    // side's zero-pair guard (plain // errors on a zero denominator).
    s"""WITH un AS MATERIALIZED (
SELECT doc_a, doc_b FROM (
$qMinHashLshSql
)),
cap AS MATERIALIZED (
SELECT doc_a, doc_b FROM (
$qMinHashCappedSql
)),
com AS (SELECT count(*) AS n_common FROM un JOIN cap USING (doc_a, doc_b))
SELECT (SELECT count(*) FROM un) AS n_uncapped,
  (SELECT count(*) FROM cap) AS n_capped,
  CAST(n_common AS BIGINT) AS n_common,
  CAST(n_common * 1000 // greatest((SELECT count(*) FROM un), 1) AS BIGINT) AS recall_pm
FROM com"""

  val qMinHashCappedSql: String =
    s"""WITH $shinglesSqlCte,
       |hv AS (SELECT doc_id,
       |  list_transform(shingles, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $MersenneP) AS hv,
       |  list_distinct(shingles) AS sset
       |  FROM sh),
       |mh AS (SELECT doc_id, sset,
       |  list_transform(range($NumHashes),
       |    k -> list_aggregate(list_transform(hv, h -> ((1 + k * 2) * h + (17 + k)) % $MersenneP), 'min')) AS sig
       |  FROM hv),
       |bands AS (SELECT doc_id,
       |  CAST(b AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 1] AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 2] AS VARCHAR) AS band_key
       |  FROM mh, (SELECT unnest(range($NumBands)) AS b)),
       |keptkeys AS (SELECT band_key FROM bands GROUP BY band_key
       |  HAVING count(*) <= $LshBucketCap),
       |kept AS (SELECT b.doc_id, b.band_key FROM bands b JOIN keptkeys USING (band_key)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) / len(list_distinct(sa.sset || sb.sset)) AS jac
       |  FROM cand JOIN mh sa ON cand.doc_a = sa.doc_id JOIN mh sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $JaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  val qMinHashLshSql: String =
    s"""WITH $shinglesSqlCte,
       |hv AS (SELECT doc_id,
       |  list_transform(shingles, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $MersenneP) AS hv,
       |  list_distinct(shingles) AS sset
       |  FROM sh),
       |mh AS (SELECT doc_id, sset,
       |  list_transform(range($NumHashes),
       |    k -> list_aggregate(list_transform(hv, h -> ((1 + k * 2) * h + (17 + k)) % $MersenneP), 'min')) AS sig
       |  FROM hv),
       |bands AS (SELECT doc_id,
       |  CAST(b AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 1] AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 2] AS VARCHAR) AS band_key
       |  FROM mh, (SELECT unnest(range($NumBands)) AS b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) / len(list_distinct(sa.sset || sb.sset)) AS jac
       |  FROM cand JOIN mh sa ON cand.doc_a = sa.doc_id JOIN mh sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $JaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // INCREMENTAL dedup — the steady-state shape of a production
  // ingestion pipeline: a (small) new batch of documents is checked
  // against the (huge) already-ingested corpus, exact-hash AND
  // near-dup, without ever re-pairing the corpus against itself.
  // Batch membership stands in as doc_id % IncrBatchMod ==
  // IncrBatchRem (~10% of docs); at 100 TB the batch is a day's crawl
  // against years of corpus.
  //
  // Scale shape — every join broadcasts the BATCH side and streams
  // the corpus exactly once per artifact:
  //  - exact: corpus md5 digests stream through a broadcast hash join
  //    against the batch digest set (16-byte keys, no text);
  //  - near: corpus band keys stream against broadcast batch bands —
  //    the corpus is never self-joined, so candidate count is bounded
  //    by batch fan-out, not corpus²;
  //  - verify: the candidate list (batch-bounded, fixed-width longs)
  //    broadcasts against the corpus shingle-set table, which streams;
  //    batch shingle sets broadcast onto the surviving candidates.
  // At scale the signature/band/digest artifacts for the corpus are
  // the incrementally-maintained tables this query's localCheckpoint
  // stands in for — the batch recomputes its own, the corpus never
  // recomputes anything.
  private val IncrBatchMod = 10
  private val IncrBatchRem = 7

  def qIncremental(s: SparkSession, dir: String): DataFrame = {
    val isBatch = col("doc_id") % IncrBatchMod === IncrBatchRem
    // memoized base: one signature pass feeds bands + both set
    // attaches (library cache contract, see [[qMinHashLsh]])
    val base = memoBase("word", s, dir)(wordSignatures(s, dir))

    val dig = Tables.documents(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
    val exact = dig.filter(!isBatch)
      .join(broadcast(dig.filter(isBatch).select(col("doc_id").as("batch_doc"), col("h"))), "h")
      .groupBy(col("batch_doc")).agg(count(lit(1)).as("n_exact"))

    val bBands = base.filter(isBatch)
      .select(col("doc_id").as("batch_doc"), explode(bandKeyStructs).as("bk"))
    val cBands = base.filter(!isBatch)
      .select(col("doc_id").as("corpus_doc"), explode(bandKeyStructs).as("bk"))
    val cand = cBands.join(broadcast(bBands), "bk")
      .select(col("batch_doc"), col("corpus_doc"))
      .dropDuplicates("batch_doc", "corpus_doc")
    val jac = size(array_intersect(col("sset_a"), col("sset_b"))).cast("double") /
      size(array_union(col("sset_a"), col("sset_b")))
    val near = base.filter(!isBatch).select(col("doc_id").as("corpus_doc"), col("sset").as("sset_b"))
      .join(broadcast(cand), "corpus_doc")
      .join(broadcast(base.filter(isBatch)
        .select(col("doc_id").as("batch_doc"), col("sset").as("sset_a"))), "batch_doc")
      .select(col("batch_doc"), jac.as("jac"))
      .filter(col("jac") >= JaccardThreshold)
      .groupBy(col("batch_doc")).agg(max(col("jac")).as("best"))

    Tables.documents(s, dir).filter(isBatch).select(col("doc_id"))
      .join(exact.withColumnRenamed("batch_doc", "doc_id"), Seq("doc_id"), "left")
      .join(near.withColumnRenamed("batch_doc", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_exact") > 0, 1).otherwise(0).as("exact_dup"),
        when(col("best").isNotNull, 1).otherwise(0).as("near_dup"),
        coalesce(round(col("best"), 4), lit(0.0)).as("best_jac"))
      .orderBy(col("doc_id"))
  }

  val qIncrementalSql: String =
    s"""WITH $shinglesSqlCte,
       |hv AS (SELECT doc_id,
       |  list_transform(shingles, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $MersenneP) AS hv,
       |  list_distinct(shingles) AS sset
       |  FROM sh),
       |mh AS (SELECT doc_id, sset,
       |  list_transform(range($NumHashes),
       |    k -> list_aggregate(list_transform(hv, h -> ((1 + k * 2) * h + (17 + k)) % $MersenneP), 'min')) AS sig
       |  FROM hv),
       |dig AS (SELECT doc_id, md5(text) AS h,
       |  doc_id % $IncrBatchMod = $IncrBatchRem AS is_batch FROM documents),
       |exact AS (SELECT b.doc_id,
       |  CASE WHEN count(c.doc_id) > 0 THEN 1 ELSE 0 END AS exact_dup
       |  FROM dig b LEFT JOIN dig c ON b.h = c.h AND NOT c.is_batch
       |  WHERE b.is_batch GROUP BY b.doc_id),
       |bands AS (SELECT doc_id,
       |  CAST(b AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 1] AS VARCHAR) || ':' || CAST(sig[$BandSize*b + 2] AS VARCHAR) AS band_key
       |  FROM mh, (SELECT unnest(range($NumBands)) AS b)),
       |cand AS (SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
       |  FROM bands b JOIN bands c ON b.band_key = c.band_key
       |  WHERE b.doc_id % $IncrBatchMod = $IncrBatchRem
       |    AND c.doc_id % $IncrBatchMod <> $IncrBatchRem),
       |j AS (SELECT batch_doc,
       |  CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) / len(list_distinct(sa.sset || sb.sset)) AS jac
       |  FROM cand JOIN mh sa ON cand.batch_doc = sa.doc_id JOIN mh sb ON cand.corpus_doc = sb.doc_id),
       |near AS (SELECT batch_doc, max(jac) AS best FROM j WHERE jac >= $JaccardThreshold GROUP BY batch_doc)
       |SELECT e.doc_id, e.exact_dup,
       |  CASE WHEN n.best IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
       |  COALESCE(round(n.best, 4), 0.0) AS best_jac
       |FROM exact e LEFT JOIN near n ON e.doc_id = n.batch_doc
       |ORDER BY e.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // SimHash: 32-bit signature from per-word md5 nibble-parity votes
  // (one bit per md5 hex position) — map-only per document; bucketing
  // on the signature (or bands of it) gives the scale-out near-dup
  // lookup. 16 bits proved too coarse on this corpus (similar word
  // distributions collided 5000 docs into ~7% pair rate).
  private val SimHashBits = 32

  /** Map-only signature kernel shared by [[qSimHash]] (ordered dump)
    * and [[qSimHashPairs]] (banded near-dup join). */
  private def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("simhash", LongType)))
    val nBits = SimHashBits
    // JVM kernel: per-word md5 once, nibble-parity votes over 32 bit
    // positions in a tight loop (the 32-pass HOF form was ~7s at
    // sf0.1 for the same integer arithmetic). Repeated words vote
    // repeatedly, like the reference-free definition in the SQL
    // oracle.
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // the test corpus is one small parquet file -> ~3 scan
      // partitions; hash-repartitioning the (tiny) raw text decouples
      // the CPU-bound kernel's parallelism from file layout. The
      // partition count MUST be explicit: repartition(col) alone is an
      // AQE-coalescible exchange, and with ~1 MB of raw text AQE
      // collapses it to ONE partition, single-threading the kernel
      // (measured: the checkpoint stage ran 1 task / 3.4s until pinned)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val ws = Text.duckWords(r.getString(1))
          val votes = new Array[Int](nBits)
          ws.foreach { w =>
            md.reset()
            val d = md.digest(w.getBytes("UTF-8"))
            var j = 0
            while (j < nBits) {
              val nibble =
                if (j % 2 == 0) (d(j / 2) >> 4) & 0xf
                else d(j / 2) & 0xf
              votes(j) += (if ((nibble & 1) == 1) 1 else -1)
              j += 1
            }
          }
          var sim = 0L
          var j = 0
          while (j < nBits) { if (votes(j) > 0) sim |= 1L << j; j += 1 }
          Row(id, sim)
        }
      }(Encoders.row(schema))
  }

  def qSimHash(s: SparkSession, dir: String): DataFrame =
    simhashSignatures(s, dir).orderBy(col("doc_id"))

  val qSimHashSql: String = {
    val bitExprs = (0 until SimHashBits).map { j =>
      s"""CASE WHEN list_aggregate(list_transform(hs,
         |  h -> CASE WHEN (strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END),
         |  'sum') > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString(" +\n  ")
    s"""WITH t AS (SELECT doc_id,
       |  list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'), w -> md5(w)) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |  $bitExprs AS simhash
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Embedding-cosine near-dup: an EXACT cosine range join (threshold
  // 0.45) expressed as an IVF-style ball-pruned block join — the
  // shape FAISS/Milvus use for exact range search over a coarse
  // quantizer, and the one that scales: nothing is collected to the
  // driver and the corpus never broadcasts.
  //
  //  1. Coarse-quantize every vector to its nearest of K deterministic
  //     centroids (broadcast join on K rows of codebook metadata —
  //     in production the codebook comes from sampled k-means).
  //  2. Per-cluster radius r_c = max distance(member, centroid) on the
  //     unit sphere (cos t <=> chord distance sqrt(2-2t)).
  //  3. Candidate cluster pairs by the triangle inequality:
  //     d(c_i, c_j) <= r_i + r_j + sqrt(2-2*threshold). Pairs of balls
  //     too far apart to contain a qualifying pair are pruned with
  //     ZERO recall loss — exactness is geometric, not probabilistic,
  //     so the all-pairs DuckDB oracle below is unchanged.
  //  4. Equi-join vectors on the candidate (cluster_a, cluster_b) list
  //     and score candidates with the codegen'd DotF64 expression.
  //
  // On this synthetic corpus (uniform random vectors, near-threshold
  // pairs) the balls overlap and pruning is modest — that is the
  // worst case for any metric-pruning method; on real clustered
  // embeddings the same plan prunes most cluster pairs. At threshold
  // 0.45 (~63deg) hyperplane-LSH cannot guarantee recall (per-bit
  // agreement only 0.65), so a lossless pruner is the right exact
  // operator; the probabilistic path is [[Similarity.qLshBuckets]].
  import graft.functions.Vectors
  import graft.plans.DotF64

  private val EmbedKMin = 16
  private val EmbedKMax = 4096

  /** Corpus-adaptive codebook size for the embed ball-pruner:
    * K = clamp(floor(sqrt(n/2)), 16, 4096). Fixed K was the r10
    * verdict's weak mark — cell population n/K grows linearly, so
    * per-cell candidate work (Σ|cell_a|·|cell_b| over overlapping
    * ball pairs) grows superlinearly (dedup_embed_cosine measured
    * 4.5× wall at 10× corpus). sqrt-growth balances the two ends:
    * the codebook collect/broadcast stays K·dim = O(√n) metadata
    * (≪ N), while cells shrink to ~√(2n) members so candidate work
    * is O(n^1.5) instead of O(n²/K_fixed). K never gates an output
    * here — ball pruning is lossless (triangle inequality) and the
    * scoring is exact, so the all-pairs oracle is invariant to K. */
  private def embedK(n: Long): Int =
    math.max(EmbedKMin.toLong,
      math.min(EmbedKMax.toLong, math.sqrt((n / 2).toDouble).toLong)).toInt

  /** Normalized vectors + rank-based K-vector codebook (the K
    * smallest vec_ids via TakeOrdered, not `vec_id < K`: an id space
    * that doesn't start at 0 would make the predicate form silently
    * return an empty codebook — and with it an empty assign frame and
    * zero output pairs while the all-pairs oracle still finds
    * matches). Both are lazy frame definitions, cheap to rebuild;
    * the corpus count behind [[embedK]] is a parquet metadata read. */
  private def embedVecsAndCents(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    DotF64.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(DotF64.dot(col("v"), col("v"))))
    val k = embedK(Tables.embeddings(s, dir).count())
    val cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    (e, cents)
  }

  /** The embed family's memoized base: every vector assigned to its
    * nearest codebook centroid, eagerly checkpointed — not persist,
    * see [[qMinHashLsh]]. One [[Similarity.assignToCentroids]]-style
    * mapPartitions kernel against the broadcast K·dim codebook: the
    * earlier relational argmax (crossJoin + struct-max + join-back)
    * materialized K·N candidate rows and shuffled twice; with
    * corpus-adaptive K = O(√n) that stage was growing as n^1.5 in
    * ROWS, where the kernel pays only the same n^1.5 in register
    * arithmetic (touches each vector once, allocates nothing per
    * candidate). Same argmax semantics: raw (unrounded) cosine,
    * strict improvement over ascending cid = ties to the smaller
    * cid, exactly the old max(struct(ccos, -cid)). */
  private[operators] def embedAssigned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val (e, cents) = embedVecsAndCents(s, dir)
    memoBase("embed_assigned", s, dir)({
      val centArr = cents.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1)
      val bc = s.sparkContext.broadcast(centArr)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)),
        StructField("nrm", DoubleType),
        StructField("cl", LongType),
        StructField("cdist", DoubleType)))
      e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .mapPartitions { it =>
          val cs = bc.value
          it.map { r =>
            val v = r.getSeq[Double](1).toArray
            val nrm = r.getDouble(2)
            var bestC = Double.NegativeInfinity
            var bestCid = Long.MaxValue
            cs.foreach { case (cid, cv, cn) =>
              val c = Vectors.dotJvm(v, cv) / (nrm * cn)
              if (c > bestC) { bestC = c; bestCid = cid }
            }
            Row(r.getLong(0), v.toSeq, nrm, bestCid,
              math.sqrt(math.max(0.0, 2.0 - 2.0 * bestC)))
          }
        }(Encoders.row(schema))
    })
  }

  def qEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    val (_, cents) = embedVecsAndCents(s, dir)
    val assigned = embedAssigned(s, dir)
    // 2. per-ball radii (K rows)
    val radii = assigned.groupBy(col("cl")).agg(max(col("cdist")).as("r"))
    // 3. ball-overlap candidate cluster pairs (K x K metadata join);
    //    both orientations are produced by the symmetric condition, so
    //    the final ia < ib filter keeps each doc pair exactly once.
    val thrDist = math.sqrt(2.0 - 2.0 * CosineThreshold) + 1e-9
    val ca = radii.join(cents, col("cl") === col("cid"))
      .select(col("cl").as("cl_a"), col("cv").as("cva"), col("cn").as("cna"), col("r").as("ra"))
    val cb = radii.join(cents, col("cl") === col("cid"))
      .select(col("cl").as("cl_b"), col("cv").as("cvb"), col("cn").as("cnb"), col("r").as("rb"))
    val cdij = sqrt(greatest(lit(0.0),
      lit(2.0) - lit(2.0) * DotF64.dot(col("cva"), col("cvb")) / (col("cna") * col("cnb"))))
    val candClusters = ca.crossJoin(cb)
      .filter(cdij <= col("ra") + col("rb") + lit(thrDist))
      .select(col("cl_a"), col("cl_b"))
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ia", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ib", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType)))
    // 4. Size-gated cutover. Below the cap the candidate sweep is ONE
    //    fused mapPartitions kernel: per-cell primitive arrays + the
    //    ball-pruned cell adjacency ride one closure broadcast, each
    //    task loops its outer vectors against the candidate cells'
    //    members (binary-searched to ib > ia) and emits only the
    //    ≥τ survivors. History of this stage: the original form
    //    carried 64-double arrays through both sides of a cl_b
    //    shuffle (2×105 MB reads at 10×); the r9 rewrite streamed a
    //    RELATIONAL pair list against a primitive vector map — but
    //    materializing n²-class candidate pairs as Rows through a
    //    join costs more than the 64-mult dot itself (r11 measured
    //    4.5s at 10× for 2e8 candidates, ~70% join/iterator overhead;
    //    the fused kernel does the same dots with zero per-pair row
    //    traffic). Above the cap the driver map no longer fits, so
    //    the pair list fetch-joins the materialized signatures table
    //    — `shuffle_hash` pinned on the pair side so the corpus-sized
    //    vector table STREAMS through each fetch rather than being
    //    built/broadcast. Both paths run the identical dotJvm/
    //    roundJvm arithmetic, so the gated values cannot diverge at
    //    the cutover (asserted by the forced-join-path equality test
    //    in AnalyticsSpec).
    val scored = if (assigned.count() <= embedBroadcastMaxVectors) {
      // cl -> (ids sorted asc, vectors, norms) as primitive arrays
      // (~1 KB/vector at dim 64; the K² adjacency is ≤ ~125k longs in
      // this regime because K = ⌊√(n/2)⌋ ≤ √(cap/2))
      val cells = new java.util.HashMap[Long, (Array[Long], Array[Array[Double]], Array[Double])]()
      assigned.select(col("cl"), col("vec_id"), col("v"), col("nrm")).collect()
        .groupBy(_.getLong(0)).foreach { case (cl, rows) =>
          val sorted = rows.sortBy(_.getLong(1))
          cells.put(cl, (sorted.map(_.getLong(1)),
            sorted.map(_.getSeq[Double](2).toArray), sorted.map(_.getDouble(3))))
        }
      val adj = new java.util.HashMap[Long, Array[Long]]()
      candClusters.collect().groupBy(_.getLong(0)).foreach { case (a, rows) =>
        adj.put(a, rows.map(_.getLong(1)))
      }
      val bcCells = s.sparkContext.broadcast(cells)
      val bcAdj = s.sparkContext.broadcast(adj)
      assigned.select(col("vec_id"), col("v"), col("nrm"), col("cl"))
        .mapPartitions { it =>
          val cm = bcCells.value
          val am = bcAdj.value
          it.flatMap { r =>
            val ia = r.getLong(0)
            val va = r.getSeq[Double](1).toArray
            val na = r.getDouble(2)
            val nbrs = am.get(r.getLong(3))
            val out = Seq.newBuilder[org.apache.spark.sql.Row]
            if (nbrs != null) nbrs.foreach { cl2 =>
              val cell = cm.get(cl2)
              if (cell != null) {
                val (ids, vecs, nrms) = cell
                // first member with id > ia (ids sorted ascending)
                var lo = 0
                var hi = ids.length
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (ids(mid) <= ia) lo = mid + 1 else hi = mid
                }
                while (lo < ids.length) {
                  val cos = graft.functions.Vectors.dotJvm(va, vecs(lo)) / (na * nrms(lo))
                  if (cos >= CosineThreshold)
                    out += org.apache.spark.sql.Row(ia, ids(lo),
                      graft.functions.Vectors.roundJvm(cos, 4))
                  lo += 1
                }
              }
            }
            out.result()
          }
        }(org.apache.spark.sql.Encoders.row(pairSchema))
    } else {
      // FIXED-WIDTH pair enumeration only (cl_b, id): arrays never
      // ride the candidate shuffle (the r9 lesson — 2×105 MB at 10×
      // when they did).
      val left = assigned.select(col("cl"), col("vec_id"))
        .join(broadcast(candClusters), col("cl") === col("cl_a"))
        .select(col("cl_b"), col("vec_id").as("ia"))
      val right = assigned.select(col("cl").as("cl_b"), col("vec_id").as("ib"))
      val pairs = left.join(right, Seq("cl_b"))
        .filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"))
      // The ia fetch shuffles only fixed-width pair keys against the
      // streaming per-doc table; the ib fetch is the one unavoidable
      // per-pair array shuffle (ball-pruned pair lists are orders of
      // magnitude below the corpus, so |pairs|·dim ≪ N·dim).
      val sigs = assigned.select(col("vec_id"), col("v"), col("nrm"))
      val withA = pairs.hint("shuffle_hash")
        .join(sigs.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na")), Seq("ia"))
      withA.hint("shuffle_hash")
        .join(sigs.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb")), Seq("ib"))
        .select(col("ia"), col("ib"), col("va"), col("na"), col("vb"), col("nb"))
        .mapPartitions { it =>
          it.flatMap { r =>
            val va = r.getSeq[Double](2).toArray
            val vb = r.getSeq[Double](4).toArray
            val cos = graft.functions.Vectors.dotJvm(va, vb) / (r.getDouble(3) * r.getDouble(5))
            if (cos >= CosineThreshold)
              Iterator.single(org.apache.spark.sql.Row(r.getLong(0), r.getLong(1),
                graft.functions.Vectors.roundJvm(cos, 4)))
            else Iterator.empty
          }
        }(org.apache.spark.sql.Encoders.row(pairSchema))
    }
    scored
      // tiny post-threshold pair list, checkpointed before the final
      // sort: the range exchange samples-then-reruns an
      // unmaterialized child — profiled as TWO ~100s-CPU kernel
      // stages (the dedup_winnow_pairs lesson)
      .localCheckpoint()
      .orderBy(col("ia"), col("ib"))
  }

  val qEmbedCosineSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${Vectors.normSql("v")} AS nrm FROM e),
       |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |  (${Vectors.dotSql("a.v", "b.v")}) / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT ia, ib, round(cos, 4) AS cosine FROM p
       |WHERE cos >= $CosineThreshold ORDER BY ia, ib""".stripMargin

  // ---------------------------------------------------------------
  // SEMANTIC CLUSTER DEDUP (SemDeDup-composed, multi-probe) — the
  // embedding-space dedup tier the five-family ensemble lacks (its
  // members are all token/hash-space): coarse-quantize the corpus
  // onto the shared stride codebook (the sim_kmeans_step machinery's
  // seeding, [[Similarity.strideSeeds]]), generate candidate pairs
  // only where two vectors SHARE one of their [[SemProbes]] nearest
  // cells, score exactly, and pick canonicals — the SemDeDup shape
  // (Abbas et al. 2023) with IVF-style multi-probe. Probes are the
  // measured recall knob at τ=0.45 on this corpus (sf0.1, vs the
  // exact [[qEmbedCosine]] pair set): 1 probe = 32/144 pairs caught,
  // 2 = 65/144 over 12% of all-pairs candidates, 3 = 96/144 over 26%
  // — the operator ships 3, and the spec + PLANS.md record the
  // recall row rather than assume it.
  //
  // Canonical pick: global priority (primary-cell ccos6 asc, vec_id)
  // — centroid-FARTHEST first, the SemDeDup keep-the-outlier rule —
  // and a vector is dropped iff ANY τ-pair partner precedes it in
  // priority. "Dominated by any earlier" (vs greedy dedup against
  // the kept-set only) keeps the semantics one-pass and closed-form
  // on both engines: greedy-MIS is an inherently sequential
  // recurrence, while this is a join predicate over the τ-SURVIVOR
  // pairs (rare by construction — the only pair rows that ever
  // materialize). Pair scores compare RAW cosines against τ with
  // identical dot association (the qEmbedCosine convention);
  // priorities and probe ranks use round-6 centroid cosines, the
  // assign stage's own scoring.
  //
  // Scale shape: one probe kernel (top-[[SemProbes]] cells per
  // vector against the broadcast K·dim codebook), ONE exchange of
  // the ×3-replicated (cid, vec_id, v, nrm) probe rows — the
  // replication IS the recall price, bounded by the probe count —
  // then a per-cell pairwise kernel over primitive arrays (cells
  // buffer in-task at ~probes·√n members by the adaptiveSeedK law)
  // emitting only ≥τ survivors; dedup/dominance/attribution run
  // relationally on that survivor set (broadcast — it is audit-
  // sized) against the metadata-width priority frame. Per-pair
  // attribution goes to the WINNER's primary cell, so every τ-pair
  // counts exactly once and the total row reconciles.
  private val SemProbes = 3

  def qSemanticClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    DotF64.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centArr = Similarity.strideSeeds(e).collect()
      .map { r =>
        val cv = r.getSeq[Double](1).toArray
        (r.getLong(0), cv, math.sqrt(Vectors.dotJvm(cv, cv)))
      }.sortBy(_._1)
    val bc = s.sparkContext.broadcast(centArr)
    val probeSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("cid", LongType),
      StructField("rank", IntegerType), StructField("ccos1", DoubleType),
      StructField("v", ArrayType(DoubleType)), StructField("nrm", DoubleType)))
    // top-SemProbes cells per vector; argsort semantics = ROW_NUMBER
    // ORDER BY ccos6 DESC, cid ASC (ties to the smaller cid)
    val probed = e
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { r =>
          val vid = r.getLong(0)
          val v = r.getSeq[Double](1).toArray
          val nrm = math.sqrt(Vectors.dotJvm(v, v))
          val scored = cs.map { case (cid, cv, cn) =>
            (Vectors.round6Jvm(Vectors.dotJvm(v, cv) / (nrm * cn)), cid)
          }
          val top = scored.sortBy { case (c, cid) => (-c, cid) }.take(SemProbes)
          val ccos1 = top.head._1
          top.iterator.zipWithIndex.map { case ((_, cid), k) =>
            Row(vid, cid, k + 1, ccos1, v.toSeq, nrm)
          }
        }
      }(Encoders.row(probeSchema))
      .localCheckpoint() // consumed by the cell sweep AND the priority frame
    val prio = probed.filter(col("rank") === 1)
      .select(col("vec_id"), col("cid").as("cid1"), col("ccos1"))
    val pairSchema = StructType(Seq(
      StructField("ia", LongType), StructField("ib", LongType)))
    // per-cell exact sweep; only ≥τ survivors leave the kernel
    val rawPairs = probed
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
      .repartition(s.sparkContext.defaultParallelism, col("cid"))
      .mapPartitions { it =>
        val cells = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)]]
        it.foreach { r =>
          cells.getOrElseUpdate(r.getLong(0),
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
        }
        cells.valuesIterator.flatMap { members =>
          val m = members.sortBy(_._1).toArray
          val out = Seq.newBuilder[Row]
          var j = 1
          while (j < m.length) {
            var i = 0
            while (i < j) {
              val cos = Vectors.dotJvm(m(i)._2, m(j)._2) / (m(i)._3 * m(j)._3)
              if (cos >= CosineThreshold) out += Row(m(i)._1, m(j)._1)
              i += 1
            }
            j += 1
          }
          out.result()
        }
      }(Encoders.row(pairSchema))
    val pairs = rawPairs.dropDuplicates("ia", "ib").localCheckpoint() // audit-sized
    // dominance + attribution: winner = priority-earlier member
    // ((ccos1, vec_id) lexicographic; ia < ib, so ties keep ia)
    val withA = prio.join(broadcast(pairs), col("vec_id") === col("ia"))
      .select(col("ia"), col("ib"), col("ccos1").as("ca"), col("cid1").as("cida"))
    val dom = prio.join(broadcast(withA), col("vec_id") === col("ib"))
      .select(col("ia"), col("ib"), col("ca"), col("cida"),
        col("ccos1").as("cb"), col("cid1").as("cidb"))
      .select(
        when(col("ca") <= col("cb"), col("ib")).otherwise(col("ia")).as("dropped_id"),
        when(col("ca") <= col("cb"), col("cida")).otherwise(col("cidb")).as("attr_cid"))
      .localCheckpoint() // audit-sized; consumed twice
    val dropped = dom.select(col("dropped_id")).distinct()
    val mem = prio.groupBy(col("cid1").as("cid"))
      .agg(count(lit(1)).as("n_members"))
    val kept = prio.join(broadcast(dropped), col("vec_id") === col("dropped_id"),
        "left_anti")
      .groupBy(col("cid1").as("cid"))
      .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("kept_sum"))
    val dp = dom.groupBy(col("attr_cid").as("cid"))
      .agg(count(lit(1)).as("dup_pairs"))
    val perCluster = mem.join(dp, Seq("cid"), "left").join(kept, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        coalesce(col("dup_pairs"), lit(0L)).as("dup_pairs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_sum"), lit(0L)).as("kept_sum"))
      .localCheckpoint() // K rows; listing + total
    val total = perCluster.agg(
        sum(col("n_members")).as("n_members"), sum(col("dup_pairs")).as("dup_pairs"),
        sum(col("n_kept")).as("n_kept"), sum(col("kept_sum")).as("kept_sum"))
      .select(lit(-1L).as("cid"), col("n_members"), col("dup_pairs"),
        col("n_kept"), col("kept_sum"))
    perCluster.unionAll(total).orderBy(col("cid"))
  }

  val qSemanticClustersSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${Vectors.normSql("v")} AS nrm FROM e),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
       |  WHERE vec_id % ${Similarity.SeedStride} = 7 ORDER BY cid LIMIT ${Similarity.seedKSql}),
       |sc AS (SELECT n.vec_id, c.cid,
       |  round((${Vectors.dotSql("n.v", "c.cv")}) / (n.nrm * c.cn), 6) AS ccos
       |  FROM n, c),
       |r3 AS (SELECT vec_id, cid, ccos,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM sc),
       |asg3 AS (SELECT vec_id, cid FROM r3 WHERE rn <= $SemProbes),
       |prio AS (SELECT vec_id, cid AS cid1, ccos AS ccos1 FROM r3 WHERE rn = 1),
       |cand AS (SELECT DISTINCT x.vec_id AS ia, y.vec_id AS ib
       |  FROM asg3 x JOIN asg3 y ON x.cid = y.cid AND x.vec_id < y.vec_id),
       |pr AS (SELECT cand.ia, cand.ib FROM cand
       |  JOIN n a ON a.vec_id = cand.ia JOIN n b ON b.vec_id = cand.ib
       |  WHERE (${Vectors.dotSql("a.v", "b.v")}) / (a.nrm * b.nrm) >= $CosineThreshold),
       |dom AS (SELECT
       |    CASE WHEN pa.ccos1 <= pb.ccos1 THEN pr.ib ELSE pr.ia END AS dropped_id,
       |    CASE WHEN pa.ccos1 <= pb.ccos1 THEN pa.cid1 ELSE pb.cid1 END AS attr_cid
       |  FROM pr JOIN prio pa ON pa.vec_id = pr.ia JOIN prio pb ON pb.vec_id = pr.ib),
       |dr AS (SELECT DISTINCT dropped_id FROM dom),
       |mem AS (SELECT cid1 AS cid, CAST(count(*) AS BIGINT) AS n_members
       |  FROM prio GROUP BY 1),
       |kept AS (SELECT p.cid1 AS cid, CAST(count(*) AS BIGINT) AS n_kept,
       |    CAST(sum(p.vec_id) AS BIGINT) AS kept_sum
       |  FROM prio p LEFT JOIN dr ON p.vec_id = dr.dropped_id
       |  WHERE dr.dropped_id IS NULL GROUP BY 1),
       |dp AS (SELECT attr_cid AS cid, CAST(count(*) AS BIGINT) AS dup_pairs
       |  FROM dom GROUP BY 1),
       |rows_ AS (SELECT mem.cid, mem.n_members,
       |    coalesce(dp.dup_pairs, 0) AS dup_pairs,
       |    coalesce(kept.n_kept, 0) AS n_kept,
       |    coalesce(kept.kept_sum, 0) AS kept_sum
       |  FROM mem LEFT JOIN dp ON mem.cid = dp.cid LEFT JOIN kept ON mem.cid = kept.cid)
       |SELECT cid, n_members, CAST(dup_pairs AS BIGINT) AS dup_pairs,
       |  CAST(n_kept AS BIGINT) AS n_kept, CAST(kept_sum AS BIGINT) AS kept_sum
       |  FROM rows_
       |UNION ALL
       |SELECT -1, CAST(sum(n_members) AS BIGINT), CAST(sum(dup_pairs) AS BIGINT),
       |  CAST(sum(n_kept) AS BIGINT), CAST(sum(kept_sum) AS BIGINT) FROM rows_
       |ORDER BY cid""".stripMargin

  // ---------------------------------------------------------------
  // DEDUP THRESHOLD SWEEP — the calibration table a pipeline owner
  // reads before PICKING τ: for each candidate cosine threshold, how
  // many pairs fire, how many documents get pulled into dedup, and
  // the mean pair cosine — computed in ONE pass over the scored pair
  // list (the [[qCapRecall]] audit-family discipline: measure the
  // knob, don't guess it). Cosines ride as exact ×10⁴ integers (the
  // 4-dp rounded score scaled — no double sums anywhere), so counts
  // and the integer mean gate exactly. Scale shape: the pair list is
  // audit-sized and checkpointed once (the expensive ball-pruned
  // scoring pipeline runs ONCE, not once per τ); the sweep is a
  // 5-row broadcast crossJoin + partial aggregates over fixed-width
  // longs.
  private val SweepTausX10k = Seq(4500L, 5500L, 6500L, 7500L, 8500L)

  def qThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = qEmbedCosine(s, dir)
      .select(col("ia"), col("ib"),
        expr("cast(round(cosine * 10000) as bigint)").as("cos_x10k"))
      .localCheckpoint()
    val taus = broadcast(SweepTausX10k.toDF("tau_x10k"))
    val hits = pairs.crossJoin(taus).filter(col("cos_x10k") >= col("tau_x10k"))
    val agg = hits.groupBy(col("tau_x10k"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("cos_x10k")).as("sum_x10k"))
    val docs = hits.select(col("tau_x10k"), explode(array(col("ia"), col("ib"))).as("d"))
      .distinct()
      .groupBy(col("tau_x10k")).agg(count(lit(1)).as("n_docs"))
    taus.join(agg, Seq("tau_x10k"), "left").join(docs, Seq("tau_x10k"), "left")
      .select(col("tau_x10k"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        expr("coalesce(sum_x10k, 0) div greatest(coalesce(n_pairs, 0), 1)").as("avg_cos_x10k"))
      .orderBy(col("tau_x10k"))
  }

  // composed without stripMargin: embeds the already-stripped
  // qEmbedCosineSql (the `||`-continuation rule)
  lazy val qThresholdSweepSql: String =
    s"""WITH pr AS MATERIALIZED (
SELECT ia, ib, CAST(round(cosine * 10000) AS BIGINT) AS cos_x10k FROM (
$qEmbedCosineSql
)),
taus AS (SELECT unnest([${SweepTausX10k.mkString(", ")}]) AS tau_x10k),
hits AS (SELECT t.tau_x10k, p.ia, p.ib, p.cos_x10k FROM pr p, taus t
  WHERE p.cos_x10k >= t.tau_x10k),
agg AS (SELECT tau_x10k, count(*) AS n_pairs, CAST(sum(cos_x10k) AS BIGINT) AS sum_x10k
  FROM hits GROUP BY tau_x10k),
docs AS (SELECT tau_x10k, count(*) AS n_docs FROM (
  SELECT DISTINCT tau_x10k, d FROM (
    SELECT tau_x10k, unnest([ia, ib]) AS d FROM hits)) GROUP BY tau_x10k)
SELECT t.tau_x10k, CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs,
  CAST(coalesce(a.sum_x10k, 0) // greatest(coalesce(a.n_pairs, 0), 1) AS BIGINT) AS avg_cos_x10k
FROM taus t LEFT JOIN agg a USING (tau_x10k) LEFT JOIN docs d USING (tau_x10k)
ORDER BY tau_x10k"""

  // ---------------------------------------------------------------

  // ---------------------------------------------------------------
  // SimHash near-dup pairs: hamming distance <= 2 over the 32-bit
  // signatures, found by the pigeonhole banding trick — split the
  // signature into 4 bands of 8 bits; any pair at hamming <= 2 has
  // at most 2 differing bands, so at least one band matches exactly.
  // Candidates come from an equi-join on (band_id, band_value) —
  // fixed-width int keys, one shuffle, no cartesian — and the exact
  // bit_count(xor) filter then removes band-collision false
  // positives. Output is provably identical to the all-pairs form,
  // which is why the oracle below stays the naive O(n^2) SQL.
  private val HammingMax = 2
  private val SimBands = 4 // bands > HammingMax ==> pigeonhole exactness
  private val SimBandBits = SimHashBits / SimBands

  def qSimHashPairs(s: SparkSession, dir: String): DataFrame = {
    // memoized base: see [[qMinHashLsh]].
    val sh = memoBase("simhash", s, dir)(simhashSignatures(s, dir))
    val bandCols = array((0 until SimBands).map { b =>
      struct(lit(b).as("band_id"),
        shiftrightunsigned(col("simhash"), SimBandBits * b)
          .bitwiseAND(lit((1L << SimBandBits) - 1)).as("band_val"))
    }: _*)
    val bands = sh.select(col("doc_id"), col("simhash"), explode(bandCols).as("bv"))
      .select(col("doc_id"), col("simhash"),
        col("bv.band_id").as("band_id"), col("bv.band_val").as("band_val"))
    val a = bands.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = bands.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sb"))
    // The exact hamming verify runs BEFORE the pair dedup: unlike the
    // MinHash pipelines (where verification needs a join to fetch the
    // sets, so deduplicating candidates first avoids re-joining
    // duplicates), both signatures are already on the joined row and
    // bit_count is one codegen'd instruction — filtering first shrinks
    // the dedup exchange from every band collision (~1M rows / 29 MB
    // at sf0.1, carried with both signatures through first() aggs) to
    // just the true near-dup pairs. hamming is a function of the pair,
    // so deduplicating after the filter is value-identical.
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= HammingMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qSimHashPairsSql: String =
    s"""WITH sh AS (
       |$qSimHashSql
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) <= $HammingMax
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // Character n-gram Jaccard — a different granularity than the word
  // shingles (catches near-dups with word-level edits).
  //
  // The full production LSH stack, tuned empirically on this corpus:
  //  - 8-char grams (5-grams on a 30-word vocabulary gave background
  //    jaccard 0.17 — every pair nearly collides; 8-grams drop it
  //    to 0.04 while keeping all 0.3+ true pairs)
  //  - 40 minhashes in 20 bands of 2: collision per band = j², so
  //    background pairs collide at 0.16% while recall at j=0.3 is
  //    1-(1-0.09)^20 ≈ 0.85
  //  - a signature-estimate prefilter (≥8/40 matching minhashes)
  //    kills the surviving false candidates with integer compares
  //    before the expensive exact gram-set intersection runs.
  // Only ints shuffle until the final verification join.
  private val CharGram = 8
  private val NgramJaccardThreshold = 0.30
  private val NgramHashes = 40
  private val NgramBandSize = 2
  private val NgramBands = NgramHashes / NgramBandSize
  private val NgramEstMin = 8 // of 40 minhashes must match

  /** Per-partition signature kernel: normalize, gram, digest, and
    * fold the 40 minima in tight JVM loops — the HOF formulation
    * (40 interpreted passes over ~450-element arrays per doc)
    * measured 60s at sf0.1; this is the same integer arithmetic
    * (order-independent minima, md5 = md5), so the oracle is
    * unaffected.
    *
    * The gram set is carried as SORTED DISTINCT 60-bit md5 hashes
    * (`gh: array<long>`), not strings: the exact-verify joins and
    * kernel then move primitive arrays instead of ~290 string objects
    * per doc (string-array ser/de through the candidate joins measured
    * 13s of the 21s total at sf0.1). The oracle computes jaccard over
    * the same hash lists, so values agree exactly — and a md5 collision
    * between distinct grams (p ~ 2^-61 per pair) would be seen
    * identically by both engines. */
  private def ngramSignatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("gh", ArrayType(LongType)),
      StructField("sig", ArrayType(LongType))))
    val p = MersenneP
    val (gramLen, nHashes) = (CharGram, NgramHashes)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // the test corpus is one small parquet file -> ~3 scan
      // partitions; hash-repartitioning the (tiny) raw text decouples
      // the CPU-bound kernel's parallelism from file layout. The
      // partition count MUST be explicit: repartition(col) alone is an
      // AQE-coalescible exchange, and with ~1 MB of raw text AQE
      // collapses it to ONE partition, single-threading the kernel
      // (measured: the checkpoint stage ran 1 task / 3.4s until pinned)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val t = Text.duckCollapse(r.getString(1))
          val grams: Array[String] =
            if (t.length <= gramLen) Array(t)
            else (0 to t.length - gramLen).map(i => t.substring(i, i + gramLen)).distinct.toArray
          val sig = Array.fill(nHashes)(Long.MaxValue)
          val gh = new Array[Long](grams.length)
          var gi = 0
          grams.foreach { gram =>
            val h = md5Mod(md, gram, p)
            gh(gi) = h
            gi += 1
            var k = 0
            while (k < nHashes) {
              val m = ((1L + 2L * k) * h + (17L + k)) % p
              if (m < sig(k)) sig(k) = m
              k += 1
            }
          }
          Row(id, gh.distinct.sorted, sig)
        }
      }(Encoders.row(schema))
  }

  def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    graft.plans.SetExprs.register(s)
    // Memoized eager base: one materialization of the signature pass,
    // nothing left in the catalog cache — see [[qMinHashLsh]] for the
    // library-contract rationale.
    val base = memoBase("ngram", s, dir)(ngramSignatures(s, dir))
    // Band keys as (band_id, h1, h2) int structs, not concat'd strings:
    // the self-join shuffles 20 fixed-width band rows per doc and the
    // candidate set is identical to the string-key form, so the oracle
    // (which builds string keys for readability) is unaffected.
    val bandStructs = array((0 until NgramBands).map { b =>
      struct(lit(b).as("band_id"),
        element_at(col("sig"), b * NgramBandSize + 1).as("h1"),
        element_at(col("sig"), b * NgramBandSize + 2).as("h2"))
    }: _*)
    val bands = base.select(col("doc_id"), explode(bandStructs).as("bk"))
    // The candidate pipeline below is CPU-heavy per row but small in
    // bytes (690k pre-distinct pairs at sf0.1) — AQE would coalesce
    // the post-shuffle stage to ~3 partitions by size, serializing
    // the per-pair compute, so the explicit width-preserving
    // repartition stays (placed BEFORE the same-key dropDuplicates so
    // it shares that exchange).
    val par = s.sparkContext.defaultParallelism
    val cand = bands.select(col("bk"), col("doc_id").as("doc_a"))
      .join(bands.select(col("bk"), col("doc_id").as("doc_b")), Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .repartition(par, col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val sigs = base.select(col("doc_id"), col("sig"))
    // Signature-estimate prefilter via the codegen'd EqCountLong
    // expression. No Catalyst built-in survives codegen here: the
    // zip_with/aggregate HOF is interpreted (2.9s) and an unrolled
    // 40-term when-chain fell back to interpreted eval (64s CPU at
    // sf0.1 — CLAUDE.md's giant-chain rule); a custom doGenCode loop
    // stays inside the join's WholeStageCodegen span with no
    // row-conversion boundary (unlike the earlier kernel form).
    //
    // Join ORIENTATION is the whole ballgame here: the per-DOC
    // signature/gram-set tables are small (5k docs x ~290 longs =
    // 12 MB at sf0.1) while the same arrays copied onto every
    // candidate PAIR are not (the r3 shuffle_hash form shuffled
    // 105 MB of array-attached pairs and AQE coalesced that stage to
    // 6 tasks — 60s of CPU in ser/de+LZ4, the bulk of the 16.9s
    // query). Explicitly broadcasting the per-doc tables makes the
    // pair frame the STREAM side of all four attach joins: pairs flow
    // through one codegen'd stage and per-pair array copies never
    // serialize into a shuffle. At 100 TB the doc-level tables
    // out-grow a broadcast and this becomes the co-partitioned join
    // on doc_id cited in the Scaladoc header — the banding/prefilter
    // structure is unchanged either way.
    val estFiltered = cand
      .join(broadcast(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))), "doc_a")
      .join(broadcast(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))), "doc_b")
      .filter(graft.plans.SetExprs.eqCount(col("sig_a"), col("sig_b")) >= NgramEstMin)
      .select(col("doc_a"), col("doc_b"))
    val sets = base.select(col("doc_id"), col("gh"))
    // Exact set-Jaccard on the surviving candidates via the codegen'd
    // merge-intersection over the sorted hash arrays: |A∩B| by linear
    // merge, |A∪B| = |A|+|B|-|A∩B|. The array_intersect/array_union
    // form over string grams was interpreted and measured 16s at
    // sf0.1 on 76k candidate pairs; this is the same set arithmetic
    // over the same (hashed) sets the oracle uses.
    val scored = estFiltered
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("gh").as("g_a"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("gh").as("g_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.plans.SetExprs.jaccardSorted(col("g_a"), col("g_b")).as("jac"))
    scored
      .filter(col("jac") >= NgramJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qNgramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
       |g AS (SELECT doc_id,
       |  list_distinct(list_transform(range(greatest(length(t) - $CharGram, 0) + 1),
       |    i -> substr(t, i + 1, $CharGram))) AS g
       |  FROM t),
       |hv AS (SELECT doc_id,
       |  list_transform(g, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $MersenneP) AS hv
       |  FROM g),
       |mh AS (SELECT doc_id, list_distinct(hv) AS gh,
       |  list_transform(range($NgramHashes),
       |    k -> list_aggregate(list_transform(hv, h -> ((1 + k * 2) * h + (17 + k)) % $MersenneP), 'min')) AS sig
       |  FROM hv),
       |bands AS (SELECT doc_id,
       |  CAST(b AS VARCHAR) || ':' || CAST(sig[$NgramBandSize*b + 1] AS VARCHAR)
       |    || ':' || CAST(sig[$NgramBandSize*b + 2] AS VARCHAR) AS band_key
       |  FROM mh, (SELECT unnest(range($NgramBands)) AS b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |est AS (SELECT doc_a, doc_b FROM cand
       |  JOIN mh sa ON cand.doc_a = sa.doc_id JOIN mh sb ON cand.doc_b = sb.doc_id
       |  WHERE list_aggregate(list_transform(range($NgramHashes),
       |    i -> CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END), 'sum') >= $NgramEstMin),
       |j AS (SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(ha.gh, hb.gh)) AS DOUBLE) / len(list_distinct(ha.gh || hb.gh)) AS jac
       |  FROM est JOIN mh ha ON est.doc_a = ha.doc_id JOIN mh hb ON est.doc_b = hb.doc_id)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $NgramJaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // Near-dup CLUSTER RESOLUTION: pair lists are not directly usable by
  // a pipeline — keeping one canonical doc per duplicate group needs
  // connected components over the pair graph. Components via
  // min-label propagation PLUS pointer jumping: every node starts
  // labeled with its own id; each round every node takes the min
  // label among itself and its neighbors (one hop), then follows its
  // label's label (l(u) <- l(l(u)), the Shiloach-Vishkin shortcut).
  // The jump doubles the distance the component min travels per
  // round, so convergence is O(log diameter), not O(diameter) — a
  // 1000-node chain converges in 10 rounds (property-tested in
  // ExtensionSpec), so the 50-round cap is evidence, not hope.
  //
  // Scale shape: each round is two equi-joins + a groupBy min — all
  // fixed-width longs; the driver only checks the changed-count
  // metadata per round, never data. Only nodes that appear in an edge
  // iterate (singletons are their own cluster by construction and are
  // unioned back via the final left join) — on a near-dup graph
  // that's a tiny fraction of the corpus. Labels are eagerly
  // localCheckpoint'ed per round so the plan does not re-grow with
  // the iteration.
  //
  // The DuckDB oracle computes the same fixpoint non-iteratively with
  // a recursive CTE (min over the transitive reachability set).

  /** MinHash-LSH near-dup pair list, memoized per (session, sfDir) and
    * materialized via localCheckpoint: [[qClusters]] consumes the
    * exact pairs [[qMinHashLsh]] produces, and recomputing the
    * signature+banding+verify pipeline inside every downstream
    * operator was the single biggest r3 bench item (22.1s). Same
    * pay-once pattern as Relational2.ensureBucketTables; at 100 TB
    * this is "the dedup-pairs table is materialized once per corpus
    * snapshot, consumers read it". */
  @volatile private var pairsFor: (SparkSession, String) = null
  private var pairsCache: DataFrame = null

  private[graft] def lshPairs(s: SparkSession, dir: String): DataFrame = synchronized {
    if (pairsFor == ((s, dir)) && pairsCache != null) return pairsCache
    // a replaced entry's localCheckpoint blocks would otherwise be
    // pinned by this static for the JVM lifetime (the ContextCleaner
    // only frees them once the RDD is unreachable) — release the old
    // checkpoint explicitly before memoizing the new one
    if (pairsCache != null) freeLocalCheckpoint(pairsCache)
    pairsCache = qMinHashLsh(s, dir).select(col("doc_a"), col("doc_b")).localCheckpoint()
    pairsFor = (s, dir)
    pairsCache
  }

  /** Bench/test hook: drops the memoized pair list and cluster labels
    * (freeing their checkpoint blocks) so the next consumer pays the
    * full cold pipeline. The memo is the right LIBRARY design (the
    * pairs table is materialized once per corpus snapshot and shared);
    * this hook exists so the BENCH can measure the cold path instead
    * of reporting a memo hit as the operator's cost — the r5 verdict's
    * "0.07s dedup_clusters" honesty item. */
  def resetMemos(): Unit = synchronized {
    if (pairsCache != null) freeLocalCheckpoint(pairsCache)
    if (labelsCache != null) freeLocalCheckpoint(labelsCache)
    pairsCache = null
    pairsFor = null
    labelsCache = null
    labelsFor = null
    baseCache.forEach((k, v) => if (!pinnedKinds.contains(k)) freeLocalCheckpoint(v._2))
    val toRemove = new java.util.ArrayList[String]()
    baseCache.forEach((k, _) => if (!pinnedKinds.contains(k)) toRemove.add(k))
    toRemove.forEach(k => baseCache.remove(k))
  }

  /** BOARD-SCOPED base pinning (bench-only; empty outside the bench,
    * so tests/Verify see the plain memo semantics). Kinds listed here
    * survive [[resetMemos]]: the bench warms them ONCE per board run
    * (their build cost reported separately in the bench JSON as
    * `pinned_base_build_sec`) and every consumer query then measures
    * its INCREMENTAL cost on the shared corpus-snapshot base — the
    * production shape (signature/assignment tables are materialized
    * once per snapshot and shared; the SPARK_GRAFT_WARM doc calls
    * this the production number). Sanctioned by the r15 verdict
    * (item 1b: "shared signature bases compute once per board run").
    *
    * HONESTY RULE: never pin a kind that some gated query outputs
    * DIRECTLY (lm_scored: text_lm_score IS that build — pinning it
    * would clock the query as a memo hit, the r5 dedup_clusters
    * dishonesty class). The signature bases here are inputs only:
    * every consumer still pays its banding/join/verify pipeline and
    * the derived pair/label memos stay per-pass cold. */
  @volatile private var pinnedKinds: Set[String] = Set.empty

  private[graft] def pinBases(kinds: Set[String]): Unit =
    synchronized { pinnedKinds = kinds }

  /** Warms every pinnable signature base concurrently (the
    * [[ensembleEdges]] base-warm discipline: scan→repartition→kernel
    * jobs overlap without join-machinery contention). */
  private[graft] def warmPinnedBases(s: SparkSession, dir: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(Seq(
      Future(memoBase("word", s, dir)(wordSignatures(s, dir))),
      Future(memoBase("simhash", s, dir)(simhashSignatures(s, dir))),
      Future(memoBase("ngram", s, dir)(ngramSignatures(s, dir))),
      Future(memoBase("winnow", s, dir)(Text.winnowFp(s, dir))),
      Future(embedAssigned(s, dir)),
      Future(Similarity.assignMemo(s, dir)))), Duration.Inf)
    ()
  }

  /** The kinds [[warmPinnedBases]] builds — the bench's pin set.
    * sim_assign (r17): the K·N IVF assignment sweep is the shared
    * CPU prefix of SEVEN consumers (qIvfTopk, qIvfPqTopk's encode,
    * both nprobe configs, k-means, cell stats, the maxsim rerank's
    * token-level candidate generation) and no gated query emits the
    * raw assignment itself — the same corpus-snapshot-index posture
    * as Dedup's embed_assigned, which was already pinned. */
  private[graft] val PinnableBaseKinds: Set[String] =
    Set("word", "simhash", "ngram", "winnow", "embed_assigned", "sim_assign")

  /** COMPOSITE-ONLY memo tier (r15 verdict item 1b, second half):
    * the five composite MEASUREMENT queries (dedup_ensemble,
    * pipe_release_gate, sim_recall_report, pipe_curation_funnel,
    * pipeline_e2e) re-run family sub-pipelines — pair lists, LM
    * keep flags, quality/repetition/canonical survivor sets, exact
    * top-k — that OTHER board queries gate in their own right. This
    * tier memoizes those sub-pipelines once per board run, consulted
    * ONLY while [[compositeTier]] is on; the bench enables it just
    * around the five composites (and their warmup build, whose cost
    * is reported in the bench JSON), so every non-composite query
    * still pays its own pipeline fully cold. Off outside the bench:
    * Verify/tests/users see plain call-through semantics. */
  @volatile private var compositeTier = false
  private val compositeCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((SparkSession, String), DataFrame)]
  private val compositeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  private[graft] def setCompositeTier(on: Boolean): Unit = { compositeTier = on }

  private[graft] def resetCompositeTier(): Unit = {
    compositeCache.forEach((_, v) => freeLocalCheckpoint(v._2))
    compositeCache.clear()
  }

  /** Serve `build` through the composite tier when it is enabled;
    * plain call-through otherwise. Same per-kind locking discipline
    * as [[memoBase]]. */
  private[graft] def compositeMemo(kind: String, s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame =
    if (!compositeTier) build
    else {
      val lock = compositeLocks.computeIfAbsent(kind, _ => new Object)
      lock.synchronized {
        val prev = compositeCache.get(kind)
        if (prev != null && prev._1 == ((s, dir))) prev._2
        else {
          if (prev != null) freeLocalCheckpoint(prev._2)
          val df = build.localCheckpoint()
          compositeCache.put(kind, ((s, dir), df))
          df
        }
      }
    }

  /** Unpersists the block-backed RDD behind a localCheckpoint'ed
    * frame ([[org.apache.spark.sql.execution.LogicalRDD]] holds it;
    * `df.unpersist()` is a no-op there — the frame is not in the
    * catalog cache). */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Per-family signature bases (word shingles, simhash, char n-gram,
    * winnow fingerprints, embed assignment), memoized per (session,
    * sfDir) behind one eager localCheckpoint each — the [[lshPairs]]
    * library rationale applied one level down: the base kernel is the
    * CPU-heavy part of every family, and each family query was
    * re-materializing its own copy. Keyed by kind in a
    * ConcurrentHashMap (per-key compute lock) so [[ensembleEdges]]
    * can warm all bases CONCURRENTLY: the base kernels are
    * scan→repartition→mapPartitions jobs with no broadcast joins, so
    * concurrent materialization fills the cores without the KeyLock
    * contention that sank full-pipeline concurrency (A/B in
    * PLANS.md). [[resetMemos]] drops these too, so the bench still
    * measures the cold pipeline. */
  private val baseCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((SparkSession, String), DataFrame)]
  // Dedicated per-KIND lock objects: running the multi-second
  // build.localCheckpoint() job inside ConcurrentHashMap.compute
  // would hold that hash BIN's lock, silently serializing concurrent
  // warms of different kinds that collide in a bin ("ngram" and
  // "embed_assigned" do, in the initial 16-bin table) — defeating
  // ensembleEdges' concurrent base warm. computeIfAbsent here only
  // allocates an Object, so it never blocks on Spark work.
  private val baseLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  private[graft] def memoBase(kind: String, s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val lock = baseLocks.computeIfAbsent(kind, _ => new Object)
    lock.synchronized {
      val prev = baseCache.get(kind)
      if (prev != null && prev._1 == ((s, dir))) prev._2
      else {
        if (prev != null) freeLocalCheckpoint(prev._2)
        val df = build.localCheckpoint()
        baseCache.put(kind, ((s, dir), df))
        df
      }
    }
  }

  /** Connected components over a symmetric (src, dst) edge list via
    * min-label propagation + pointer jumping. Returns (labels for
    * every node appearing in `edges`, rounds used). Exposed for the
    * synthetic-chain convergence property test. */
  private[graft] def resolveComponents(
      edges: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    // The iteration frames are edge-node-sized (a tiny fraction of the
    // corpus on a near-dup graph) but each round runs ~5 jobs; at the
    // session's 32 shuffle partitions the per-task scheduling overhead
    // dominates those tiny shuffles (the streaming StreamPartitions
    // measurement). The width is pinned to 8 PER PLAN via explicit
    // repartition(CcPartitions, key) placed where the loop's own
    // exchanges already sit — never by mutating the session-global
    // shuffle.partitions conf, which a concurrent query being built on
    // the same session (the library-contract surface) could observe.
    // localCheckpoint preserves the physical partitioning in its
    // LogicalRDD and projections are alias-aware, so each round's
    // co-partitioned joins plan ZERO additional exchanges. Partition
    // count cannot change the min-label fixpoint. At true scale the
    // label table is large and the session width is the right one;
    // this mirrors how an iterative job sizes its own stages.
    // AQE is scoped OFF for the loop (r18, GraftSession.withLoopAqeOff):
    // no exchange feeds any loop join (all zip on checkpoints), so
    // AQE's only effect here was one scheduled stage-job per pinned
    // exchange per round.
    graft.GraftSession.withLoopAqeOff(edges.sparkSession) {
      resolveComponentsLoop(edges, maxRounds)
    }
  }

  private val CcPartitions = 8

  private def resolveComponentsLoop(
      edges0: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    val p = CcPartitions
    // loop-invariant edge list: partitioned ONCE on dst (the join key
    // of every round's neighbor lookup) and materialized
    val edges = edges0.repartition(p, col("dst")).localCheckpoint()
    // the p-wide repartition ahead of the same-key dropDuplicates
    // shares one exchange (the CLAUDE.md dropDuplicates rule)
    var labels = edges.select(col("src").as("doc_id"))
      .repartition(p, col("doc_id")).dropDuplicates("doc_id")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // labels is doc_id-partitioned; the alias to dst carries the
      // partitioning, so this join zips with edges' dst partitioning
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nbr_label")), "dst")
        .repartition(p, col("src"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_label")).as("nbr_min"))
      // hop: take the min over self + neighbors (labels only
      // decrease); the OLD label rides along so the convergence check
      // below needs no extra join
      val prop = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
      // jump: l(u) <- min(l(u), l(l(u))) — label values are node ids,
      // so every label row resolves against the labels frame itself.
      // (A second jump per round — log₄ convergence — was measured
      // SLOWER here: the self-join's duplicated subtree recomputes
      // the whole round twice, costing more than the saved rounds.)
      val next = prop.repartition(p, col("cluster_id"))
        .join(prop.select(col("doc_id").as("cluster_id"), col("cluster_id").as("pl")),
          Seq("cluster_id"), "left")
        .select(col("doc_id"), col("old"),
          least(col("cluster_id"), coalesce(col("pl"), col("cluster_id"))).as("cluster_id"))
        // back to doc_id partitioning: ALL of next round's label joins
        // then zip exchange-free
        .repartition(p, col("doc_id"))
        .select(col("doc_id"), col("cluster_id"),
          (col("cluster_id") < col("old")).cast("long").as("ch"))
        .localCheckpoint()
      // the changed count is a map-only sum over the checkpointed
      // partitions — the previous form re-joined next against labels
      // (one extra ~5-stage job per round on a loop that is pure
      // per-job fixed overhead at test SF)
      val changed = next.agg(coalesce(sum(col("ch")), lit(0L)).as("c")).first().getLong(0)
      converged = changed == 0
      labels = next.select(col("doc_id"), col("cluster_id"))
      rounds += 1
    }
    (labels, rounds)
  }

  /** Resolved (doc_id, cluster_id) labels, memoized per (session, dir)
    * like [[lshPairs]]: three queries consume them (qClusters,
    * qCanonical, Pipeline.qPipelineE2e) and the O(log d) propagation
    * rounds are the expensive part. At 100 TB this IS "the cluster
    * table is materialized once per corpus snapshot". */
  @volatile private var labelsFor: (SparkSession, String) = null
  private var labelsCache: DataFrame = null

  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = synchronized {
    if (labelsFor == ((s, dir)) && labelsCache != null) return labelsCache
    if (labelsCache != null) freeLocalCheckpoint(labelsCache)
    val pairs = lshPairs(s, dir)
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val (labels, _) = resolveComponents(edges)
    // union singletons back: docs with no near-dup edge are their own
    // cluster — they never enter the iteration
    labelsCache = Tables.documents(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .localCheckpoint()
    labelsFor = (s, dir)
    labelsCache
  }

  def qClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir).orderBy(col("doc_id"))

  val qClustersSql: String =
    s"""WITH edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM (
       |$qMinHashLshSql
       |  ) p
       |),
       |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |reach AS (
       |  WITH RECURSIVE r(node, root) AS (
       |    SELECT doc_id, doc_id FROM documents
       |    UNION
       |    SELECT s.dst, r.root FROM r JOIN sym s ON s.src = r.node
       |  ) SELECT node, root FROM r
       |)
       |SELECT node AS doc_id, min(root) AS cluster_id
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // WINNOW-FINGERPRINT NEAR-DUP PAIRS — the fifth member of the
  // near-dup family (minhash, simhash, n-gram Jaccard, embedding
  // cosine, winnowing), and the one tuned for SUBSTRING reuse: two
  // docs share a winnowing hash iff they share a substring of
  // length ≥ k+w-1, so CONTAINMENT (shared / smaller fingerprint,
  // exact integer per-mille) is the natural score — it catches a
  // short doc embedded in a long one, which symmetric Jaccard
  // dilutes.
  //
  // Candidate generation is DF-CAPPED from the start (unlike
  // [[qMinHashCapped]], which ships beside an uncapped twin): a
  // winnowing hash appearing in > [[WinnowMaxDf]] docs is corpus
  // boilerplate with Σdf² pair cost and no discriminative value —
  // the uncapped self-join measured 24s at sf0.1 on this small-
  // vocabulary corpus (all-pairs collapse), the MOSS paper's "ignore
  // very common fingerprints" rule in action. The cap bounds the
  // inverted index at df·|hashes| postings while SCORING uses the
  // FULL fingerprint sets (broadcast, array-intersect per candidate
  // — the qMinHashLsh verify orientation), so a found pair's row is
  // identical to the uncapped query's. Measured recall of the cap:
  // 25/25 true ≥0.7-containment pairs at sf0.01, 226/258 at sf0.1 —
  // the documented trade for removing the quadratic term.
  private val WinnowContainmentPm = 700 // shared/min(|A|,|B|) >= 0.7
  private val WinnowMaxDf = 16

  /** Scored winnow pair list WITHOUT the final sort or its guarding
    * checkpoint — [[qWinnowPairs]] adds both (the range exchange
    * would re-run the scoring chain); [[ensembleEdges]] consumes this
    * form directly so the scoring chain stays lazy and joins the
    * union job instead of materializing serially at construction. */
  private def winnowPairsUnsorted(s: SparkSession, dir: String): DataFrame = {
    graft.plans.SetExprs.register(s) // idempotent; the scorer calls intersectCountSorted
    val fps = memoBase("winnow", s, dir)(Text.winnowFp(s, dir))
    // Candidates come from the inverted index GROUPED by hash: df is
    // just the group size (no window pass), the DF cap drops
    // boilerplate groups, and pairs expand per group from the ≤
    // WinnowMaxDf sorted doc list — an interpreted HOF over ≤16
    // elements, vocabulary-scale. This replaces the earlier postings
    // SELF-join on h, which planned the whole window+filter subtree
    // under BOTH join children (the stats-less checkpoint defeats
    // auto-broadcast reuse) and paid it once more as a single-task
    // broadcast build — two ~2.7s stages at sf0.1 for a query whose
    // real work is ~1s. One exchange on h total.
    val cand = fps
      .select(col("doc_id"), explode(col("fp")).as("h"))
      .groupBy(col("h")).agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, WinnowMaxDf))
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS doc_a, y AS doc_b))))"))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      // the pair exchange is ~1 MB but the scoring chain it feeds is
      // CPU-bound: an explicit width (not AQE-coalescible) keeps the
      // dedup + melt + attach + intersect stage 32-wide (measured
      // 2.7s single-task → parallel); dropDuplicates shares this
      // exchange (same keys)
      .repartition(s.sparkContext.defaultParallelism, col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // The per-doc set table broadcasts ONCE: each pair melts into two
    // (pair, doc_id) rows, the one broadcast join attaches that side's
    // full fingerprint set (candidates stream — the qMinHashLsh
    // orientation; the arrays ride the post-shuffle stage, never a
    // shuffle), and min_by/max_by on doc_id re-pivots the sides
    // (doc_a < doc_b, so side selection is doc_id order — an
    // ObjectHashAggregate comparing LONGS, where a max-over-array
    // re-pivot measured as a SortAggregate pushing 212k ~900-byte
    // array rows through the unsafe sorter). Two aliased attach joins
    // previously paid the single-task broadcast build twice (~1.4s
    // each — alias canonicalization defeats ReuseExchange).
    val sets = broadcast(
      fps.select(col("doc_id"), col("fp"), size(col("fp")).cast("long").as("n")))
    cand
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(sets, "doc_id")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        min_by(col("fp"), col("doc_id")).as("fp_a"),
        max_by(col("fp"), col("doc_id")).as("fp_b"),
        min(col("n")).as("n_min"))
      // codegen'd linear merge over the sorted-distinct fingerprint
      // arrays — size(array_intersect(...)) built a hash set AND the
      // result array per pair just to take its length (34s CPU at
      // sf0.1; the merge count is ~4s)
      .withColumn("n_shared",
        graft.plans.SetExprs.intersectCountSorted(col("fp_a"), col("fp_b")).cast("long"))
      .withColumn("containment_pm", expr("n_shared * 1000 div n_min"))
      .filter(col("containment_pm") >= WinnowContainmentPm)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("containment_pm"))
  }

  def qWinnowPairs(s: SparkSession, dir: String): DataFrame =
    winnowPairsUnsorted(s, dir)
      // materialize the ~|survivors| rows before the sort: the range
      // exchange SAMPLES its child and then runs it again — without
      // this the whole scoring chain executes twice (measured ~2s ×2)
      .localCheckpoint()
      .orderBy(col("doc_a"), col("doc_b"))

  val qWinnowPairsSql: String =
    s"""WITH ${Text.winnowCteSql},
       |sz AS (SELECT doc_id, len(fp) AS n FROM fps),
       |f AS (SELECT doc_id, unnest(fp) AS h FROM fps),
       |df AS (SELECT h FROM f GROUP BY h HAVING count(*) <= $WinnowMaxDf),
       |fk AS (SELECT f.doc_id, f.h FROM f JOIN df USING (h)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id),
       |c AS (SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(fa.fp, fb.fp)) AS BIGINT) AS n_shared,
       |  CAST(len(list_intersect(fa.fp, fb.fp)) * 1000 // least(sa.n, sb.n) AS BIGINT) AS containment_pm
       |  FROM cand JOIN fps fa ON cand.doc_a = fa.doc_id
       |  JOIN fps fb ON cand.doc_b = fb.doc_id
       |  JOIN sz sa ON cand.doc_a = sa.doc_id JOIN sz sb ON cand.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, n_shared, containment_pm FROM c
       |WHERE containment_pm >= $WinnowContainmentPm
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------
  // TRIANGLE / WEDGE COUNTS over the near-dup graph — the local-
  // clustering ingredients (triangles per node, wedges = C(deg,2))
  // that grade near-dup graph QUALITY: genuine duplicate families
  // close their triangles (re-posts of re-posts match each other),
  // while LSH false positives show as high-wedge/low-triangle nodes.
  // Exact integer outputs only (counts and an integer-div wedge
  // formula) — no float ratio to hang the gate on.
  //
  // Scale shape: the canonical-orientation trick — edges stored once
  // as doc_a < doc_b, triangles enumerated as x<y<z via two equi-
  // joins on fixed-width longs — counts each triangle exactly once
  // with no 6-way symmetric blowup (the distributed node-iterator
  // algorithm); per-node attribution explodes the 3 corners and
  // partial-aggregates. Consumes the memoized [[lshPairs]] edge list
  // like [[qClusters]]/[[qPagerankStep]].
  def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val e = lshPairs(s, dir) // (doc_a, doc_b), doc_a < doc_b, distinct
    val deg = e.select(col("doc_a").as("doc_id"))
      .unionAll(e.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val tri = e.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .join(e.select(col("doc_a").as("y"), col("doc_b").as("z")), "y")
      .join(e.select(col("doc_a").as("x"), col("doc_b").as("z")), Seq("x", "z"))
      .select(col("x"), col("y"), col("z"))
    val triPerNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
    deg.join(triPerNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        expr("degree * (degree - 1) div 2").as("n_wedges"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"))
      .orderBy(col("doc_id"))
  }

  val qTrianglesSql: String =
    s"""WITH edges AS (
       |  SELECT doc_a, doc_b FROM (
       |$qMinHashLshSql
       |  ) p
       |),
       |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT doc_a AS doc_id FROM edges UNION ALL SELECT doc_b FROM edges)
       |  GROUP BY doc_id),
       |tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
       |  FROM edges e1 JOIN edges e2 ON e1.doc_b = e2.doc_a
       |  JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       |tn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM (
       |  SELECT x AS doc_id FROM tri UNION ALL SELECT y FROM tri
       |  UNION ALL SELECT z FROM tri) GROUP BY doc_id)
       |SELECT d.doc_id, d.degree,
       |  CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS n_wedges,
       |  CAST(COALESCE(tn.nt, 0) AS BIGINT) AS n_triangles
       |FROM deg d LEFT JOIN tn USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // LABEL-PROPAGATION COMMUNITIES — two synchronous LPA rounds over
  // the near-dup graph: each node adopts the most frequent label
  // among its neighbors AND itself, ties broken by smallest label
  // (fully deterministic, unlike textbook random-order LPA). LPA
  // finds DENSITY communities where connected components find mere
  // reachability — on a dedup graph that separates "hub template +
  // orbiting variants" inside one large weakly-connected blob.
  // The per-round argmax is the [[qCanonical]] pattern: max over
  // (count, -label) structs — a map-side-combinable partial
  // aggregate, no per-node sort window. Per round: one join on dst +
  // two vote aggregates, all on fixed-width (node, label) longs —
  // the resolveComponents cost shape. Output is community-level:
  // size and internal-edge count (n_internal = edges whose endpoints
  // agree — the LPA quality signal), zero-restored via left join.
  def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val pairs = lshPairs(s, dir)
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    def round(labels: DataFrame): DataFrame = {
      val votes = sym
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .select(col("src").as("node"), col("lbl"))
        .unionAll(labels) // self vote
      votes.groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("c"))
        .select(col("node"), struct(col("c"), (-col("lbl")).as("nl")).as("cand"))
        .groupBy(col("node")).agg(max(col("cand")).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
    }
    val init = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    val l2 = round(round(init)).localCheckpoint() // feeds sizes AND edge agreement
    val agree = pairs
      .join(l2.select(col("node").as("doc_a"), col("lbl").as("la")), "doc_a")
      .join(l2.select(col("node").as("doc_b"), col("lbl").as("lb")), "doc_b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("ni"))
    l2.groupBy(col("lbl").as("community")).agg(count(lit(1)).as("n_members"))
      .join(agree, Seq("community"), "left")
      .select(col("community"), col("n_members"),
        coalesce(col("ni"), lit(0L)).as("n_internal"))
      .orderBy(col("community"))
  }

  val qLabelPropSql: String = {
    def roundSql(i: Int, prev: String): String =
      s"""v$i AS (SELECT e.src AS node, l.lbl FROM edges e JOIN $prev l ON l.node = e.dst
         |  UNION ALL SELECT node, lbl FROM $prev),
         |c$i AS (SELECT node, lbl, count(*) AS c FROM v$i GROUP BY node, lbl),
         |l$i AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |  FROM c$i) WHERE rn = 1)""".stripMargin
    s"""WITH p AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (
       |$qMinHashLshSql
       |  ) q
       |),
       |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${roundSql(1, "l0")},
       |${roundSql(2, "l1")},
       |agree AS (SELECT la.lbl AS community, count(*) AS ni
       |  FROM p JOIN l2 la ON la.node = p.doc_a JOIN l2 lb ON lb.node = p.doc_b
       |  WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |sz AS (SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members FROM l2 GROUP BY lbl)
       |SELECT sz.community, sz.n_members, CAST(coalesce(agree.ni, 0) AS BIGINT) AS n_internal
       |FROM sz LEFT JOIN agree USING (community) ORDER BY community""".stripMargin
  }

  // ---------------------------------------------------------------
  // PAGERANK STEP over the near-dup graph — the graph-analytics
  // primitive (one power-iteration of PR with damping 0.85, uniform
  // start) computed on the memoized LSH pair list: rank within a
  // duplicate cluster identifies the "hub" version of a document the
  // same way cluster resolution identifies membership. FIXED-POINT
  // INTEGER arithmetic on purpose: per-edge contributions are
  // 1e9 `div` outdeg and the damped combine is integer div, so the
  // unordered per-node sum is exact (the unordered-double-sum trap
  // has no float to bite); a float PageRank differs across engines in
  // the last decimals for exactly that reason. One shuffle per hop
  // (join on src, groupBy dst) — the standard distributed PR shape,
  // horizontally parallel in nodes; a driver loop iterates to
  // convergence at scale exactly like [[resolveComponents]].
  def qPagerankStep(s: SparkSession, dir: String): DataFrame = {
    val pairs = lshPairs(s, dir)
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val contrib = sym.join(deg, "src")
      .select(col("dst"), expr("1000000000 div outdeg").as("c"))
    contrib.groupBy(col("dst").as("doc_id"))
      .agg(count(lit(1)).as("indeg"), sum(col("c")).as("recv"))
      .select(col("doc_id"), col("indeg"),
        (lit(150000000L) + expr("(recv * 85) div 100")).as("pr_scaled"))
      .orderBy(col("doc_id"))
  }

  val qPagerankStepSql: String =
    s"""WITH p AS (
       |$qMinHashLshSql
       |),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |          UNION ALL SELECT doc_b, doc_a FROM p),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |contrib AS (SELECT e.dst, 1000000000 // d.outdeg AS c
       |  FROM edges e JOIN deg d ON e.src = d.src)
       |SELECT dst AS doc_id, count(*) AS indeg,
       |  CAST(150000000 + (sum(c) * 85) // 100 AS BIGINT) AS pr_scaled
       |FROM contrib GROUP BY dst ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // PAGERANK TO CONVERGENCE — [[qPagerankStep]]'s update rule
  // iterated with the [[qHitsConverge]] loop discipline, on the
  // DIRECTED customer→part graph (the HITS co-purchase edges kept
  // one-way). The direction matters: on the symmetric near-dup pair
  // graph PageRank is degenerate (near-clique components have equal
  // degrees, so the uniform vector is already stationary — measured
  // delta 0 at round 1), while the directed bipartite graph has
  // heterogeneous out-degrees AND dangling part nodes, so rank mass
  // genuinely redistributes and the damping contraction shows up as
  // a shrinking per-round delta. Gated per round: Σ|pr_r − pr_{r−1}|
  // and max pr, exact BIGINT (contributions are `pr div outdeg` —
  // truncating division, operands non-negative, bit-identical on
  // both engines; dangling nodes absorb rank and contribute none —
  // the deterministic leak variant, stated in the trace rather than
  // libm-renormalized away). Loop shape: edges repartitioned ONCE
  // and checkpointed (loop-invariant), scores checkpointed per round
  // so the plan never grows; the oracle unrolls the same rounds as
  // MATERIALIZED chained CTEs (one per step — the
  // accumulator-as-column-ref rule).
  private val PrMaxRounds = 6

  def qPagerankConverge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p0 = CcPartitions
    // offset projection over the shared [[copurchaseEdges]] memo —
    // map-only over the checkpointed blocks, partitioning preserved
    // through the alias (src = c)
    val edges = copurchaseEdges(s, dir)
      .select(col("c").as("src"), (col("p") + 10000000L).as("dst"))
    graft.GraftSession.withLoopAqeOff(s) {
    // deg consumes the edge memo's hash(src, 8) partitioning —
    // exchange-free groupBy whose output zips into the node join;
    // the node list pins its width BEFORE the distinct so dedup and
    // the deg join share the union's one exchange (r17, guide §2.4 —
    // previously: 32-wide distinct exchange + 32-wide deg exchange +
    // the explicit 8-wide re-pin = 3 exchanges for this init)
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .repartition(p0, col("node")).distinct()
      .join(deg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(1L)).as("outdeg"))
      .localCheckpoint()
    var pr = nodes.select(col("node"), col("outdeg"), lit(1000000000L).as("pr"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 0
    var done = false
    while (r < PrMaxRounds && !done) {
      r += 1
      // one exchange per round (r17, guide §2.4): pin the width BEFORE
      // the groupBy so the rank-mass aggregation consumes hash(dst, 8)
      // exchange-free and the score join zips on it — the
      // qHitsConverge half-step fusion (the groupBy previously planned
      // its own exchange and the pin re-exchanged the aggregate)
      val recv = edges.join(pr, edges("src") === pr("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .repartition(p0, col("dst"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("recv"))
      val next = pr.select(col("node"), col("outdeg"), col("pr").as("prev"))
        .join(recv, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(150000000L) + expr("(coalesce(recv, 0) * 85) div 100")).as("pr"),
          col("prev"))
        .localCheckpoint()
      val row = next.agg(
        coalesce(sum(abs(col("pr") - col("prev"))), lit(0L)).as("d"),
        coalesce(max(col("pr")), lit(0L)).as("m")).collect()(0)
      rounds += ((r.toLong, row.getLong(0), row.getLong(1)))
      pr = next.select(col("node"), col("outdeg"), col("pr"))
      done = row.getLong(0) == 0L
    }
    rounds.toSeq.toDF("round", "delta", "pr_max").orderBy(col("round"))
    } // withLoopAqeOff
  }

  val qPagerankConvergeSql: String = {
    val steps = (1 to PrMaxRounds).map { r =>
      val pp = s"p${r - 1}"
      s"""r$r AS MATERIALIZED (SELECT e.dst AS node, CAST(sum(p.pr // p.outdeg) AS BIGINT) AS recv
         |  FROM edges e JOIN $pp p ON e.src = p.node GROUP BY e.dst),
         |p$r AS MATERIALIZED (SELECT n.node, n.outdeg,
         |  CAST(150000000 + (coalesce(r.recv, 0) * 85) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN r$r r USING (node)),
         |d$r AS (SELECT $r AS round,
         |  (SELECT CAST(sum(abs(x.pr - y.pr)) AS BIGINT) FROM p$r x JOIN $pp y USING (node)) AS delta,
         |  (SELECT CAST(max(pr) AS BIGINT) FROM p$r) AS pr_max)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to PrMaxRounds).map(r => s"SELECT * FROM d$r").mkString(" UNION ALL ")
    s"""WITH edges AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS src, l.l_partkey + 10000000 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |dg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (SELECT n.node, coalesce(d.outdeg, 1) AS outdeg FROM (
       |    SELECT src AS node FROM edges UNION SELECT dst FROM edges) n
       |  LEFT JOIN dg d USING (node)),
       |p0 AS MATERIALIZED (SELECT node, outdeg, 1000000000::BIGINT AS pr FROM nodes),
       |""".stripMargin + steps + s""",
alld AS ($unions),
stop AS (SELECT coalesce(min(round), $PrMaxRounds) AS k FROM alld WHERE delta = 0)
SELECT CAST(round AS BIGINT) AS round, delta, pr_max FROM alld, stop WHERE round <= k ORDER BY round"""
  }

  // ---------------------------------------------------------------
  // Canonical-doc selection — the step that CONSUMES the near-dup
  // clusters: per cluster keep one representative (longest text,
  // tiebreak smallest doc_id) and report how many members it stands
  // for. This is the "dedup actually removes data" operator: a corpus
  // pipeline runs clusters → canonical → anti-join to drop the rest.
  //
  // The argmax is max(struct(n_chars, -doc_id)) — a PARTIAL (map-side
  // combinable) aggregate over fixed-width ints, not a window: no
  // per-cluster sort, and only one candidate struct per cluster per
  // partition reaches the shuffle. At 100 TB the labels frame is a
  // (doc_id, cluster_id) long table, the metadata join is a
  // co-partitioned equi-join on doc_id, and no text moves at all.
  def qCanonical(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(s, dir)
    Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("n_chars").as("c"), (-col("doc_id")).as("negid"))).as("best"))
      .select(
        col("cluster_id"),
        (-col("best.negid")).as("kept_doc"),
        col("best.c").as("kept_chars"),
        col("n_members"))
      .orderBy(col("cluster_id"))
  }

  // ---------------------------------------------------------------
  // DEGREE DISTRIBUTION — the graph-shape audit over the
  // customer→part co-purchase edges (the HITS/PageRank substrate):
  // per side, the exact (degree → node count) histogram. This is the
  // number that decides every downstream graph plan — a heavy-tailed
  // in-degree says "salt the hot parts before any join on part"
  // (the maint_skew_report discipline applied to graph data), and a
  // shifted distribution between snapshots is structural drift. Two
  // 8-byte-key partial aggregates (degree per node, then nodes per
  // degree); histogram-sized output.
  def qDegreeDist(s: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(s, dir) // one distinct pass feeds both sides
    def hist(side: String, key: String) = edges
      .groupBy(col(key).as("node")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .select(lit(side).as("side"), col("degree"), col("n_nodes"))
    hist("customer", "c").unionAll(hist("part", "p"))
      .orderBy(col("side"), col("degree"))
  }

  val qDegreeDistSql: String =
    """WITH e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |cd AS (SELECT c AS node, count(*) AS degree FROM e GROUP BY c),
      |pd AS (SELECT p AS node, count(*) AS degree FROM e GROUP BY p),
      |h AS (SELECT 'customer' AS side, degree, count(*) AS n_nodes FROM cd GROUP BY degree
      |  UNION ALL SELECT 'part', degree, count(*) FROM pd GROUP BY degree)
      |SELECT side, CAST(degree AS BIGINT) AS degree, CAST(n_nodes AS BIGINT) AS n_nodes
      |FROM h ORDER BY side, degree""".stripMargin

  // ---------------------------------------------------------------
  // CLUSTER SOURCE PURITY — do near-dup clusters stay inside one
  // source? A multi-source cluster is SYNDICATED content (the same
  // article carried by several feeds) — the provenance signal that
  // changes dedup policy (drop syndicated copies corpus-wide, but
  // within-source near-dups may be boilerplate needing a different
  // fix). Per multi-member cluster: distinct sources, the modal
  // source's share per-mille (deterministic modal pick: count desc,
  // source asc), and the syndicated flag. Doc-count-sized joins over
  // the memoized labels; singletons are pure by construction and
  // excluded.
  def qClusterPurity(s: SparkSession, dir: String): DataFrame = {
    val labeled = clusterLabels(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
    val bySrc = labeled.groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
      .orderBy(col("n").desc, col("source"))
    bySrc
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .withColumn("n_sources", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .filter(col("rn") === 1 && col("n_members") > 1)
      .select(col("cluster_id"), col("n_members"), col("n_sources"),
        col("source").as("modal_source"),
        expr("n * 1000 div n_members").as("modal_share_pm"),
        when(col("n_sources") > 1, 1L).otherwise(0L).as("syndicated"))
      .orderBy(col("cluster_id"))
  }

  lazy val qClusterPuritySql: String =
    s"""WITH labels AS (
$qClustersSql
),
j AS (SELECT l.cluster_id, d.source FROM labels l JOIN documents d USING (doc_id)),
bs AS (SELECT cluster_id, source, count(*) AS n FROM j GROUP BY 1, 2),
agg AS (SELECT cluster_id, CAST(sum(n) AS BIGINT) AS n_members, count(*) AS n_sources FROM bs GROUP BY 1),
md AS (SELECT cluster_id, source AS modal_source, n FROM (
  SELECT cluster_id, source, n,
    ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY n DESC, source) AS rn FROM bs)
  WHERE rn = 1)
SELECT a.cluster_id, a.n_members, CAST(a.n_sources AS BIGINT) AS n_sources,
  m.modal_source, CAST(m.n * 1000 // a.n_members AS BIGINT) AS modal_share_pm,
  CAST(CASE WHEN a.n_sources > 1 THEN 1 ELSE 0 END AS BIGINT) AS syndicated
FROM agg a JOIN md m USING (cluster_id)
WHERE a.n_members > 1 ORDER BY a.cluster_id"""

  // ---------------------------------------------------------------
  // K-CORE DECOMPOSITION — iterative peeling on the co-purchase
  // graph: drop every node of degree < K, remove its edges, repeat
  // to the fixpoint (the dense-subgraph primitive behind
  // spam/boilerplate-ring mining and community seeding). K=25 sits
  // just above this graph's median degree, so the peel CASCADES —
  // each round's removals push more nodes under the bar (7 rounds to
  // total core collapse at sf0.01: 2948 → 2619 → 2316 → 1869 → 1119
  // → 90 → 0) — which is exactly the phenomenon the gated
  // (round, nodes, pairs) trace exhibits. Loop discipline as CC/
  // HITS: edges checkpointed per round (fixed-width longs), one
  // degree partial-agg + two semi-joins per round, 1-row collect;
  // the oracle unrolls the same rounds as chained MATERIALIZED CTEs
  // and emits the strictly-decreasing prefix.
  private val KcoreK = 25
  private val KcoreMaxRounds = 10

  def qKcore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p0 = CcPartitions
    // round-0 edges are the offset projection of the shared
    // [[copurchaseEdges]] memo (map-only, partitioning preserved;
    // memo built OUTSIDE the loop-AQE scope — withLoopAqeOff);
    // each peel round re-checkpoints its own shrunk edge list below
    var edges = copurchaseEdges(s, dir)
      .select(col("c").as("src"), (col("p") + 10000000L).as("dst"))
    graft.GraftSession.withLoopAqeOff(s) {
    var prevNodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct().count()
    val trace = Array.newBuilder[(Long, Long, Long)]
    var r = 0
    var done = false
    while (r < KcoreMaxRounds && !done) {
      r += 1
      // ONE exchange for the degree peel (r17, guide §2.4): the width
      // pin moves BEFORE the groupBy, so the aggregation consumes
      // hash(node, 8) exchange-free and the filter preserves that
      // partitioning into the checkpoint — previously the groupBy
      // planned its own exchange and the pin re-exchanged the
      // filtered keep set (2 exchanges + 2 AQE stage-jobs per round).
      val deg = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node")))
        .repartition(p0, col("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= KcoreK).select(col("node"))
        .localCheckpoint()
      // keep is checkpointed (stats erased — no auto-broadcast, the
      // CLAUDE.md rule) and node-corpus-sized at scale, so it stays a
      // shuffle semi join with the hash build pinned on the keep side:
      // the src probe zips on the shared hash(·, 8) partitioning, the
      // dst probe pays the round's one edge re-key.
      val next = edges
        .join(keep.withColumnRenamed("node", "src").hint("shuffle_hash"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst").hint("shuffle_hash"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .repartition(p0, col("src")).localCheckpoint()
      // one fused 2-row collect for both counts (was two count jobs
      // per round — the hits-converge job-overhead lesson). On the
      // stable-core fixpoint the freshly built `next` equals `edges`
      // by construction (same keep set both sides), so building it
      // before the check changes no gated value.
      val cnts = keep.agg(count(lit(1)).as("n"))
        .unionAll(next.agg(count(lit(1)).as("n"))).collect()
      val (nKeep, nEdges) = (cnts(0).getLong(0), cnts(1).getLong(0))
      if (nKeep == prevNodes) done = true
      else {
        edges = next
        trace += ((r.toLong, nKeep, nEdges))
        prevNodes = nKeep
        if (nKeep == 0) done = true
      }
    }
    trace.result().toSeq.toDF("round", "n_nodes", "n_pairs").orderBy(col("round"))
    } // withLoopAqeOff
  }

  val qKcoreSql: String = {
    val rounds = (1 to KcoreMaxRounds).map { r =>
      val pe = s"e${r - 1}"
      s"""d$r AS (SELECT node, count(*) AS deg FROM (
         |  SELECT src AS node FROM $pe UNION ALL SELECT dst FROM $pe) GROUP BY node),
         |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $KcoreK),
         |e$r AS MATERIALIZED (SELECT e.src, e.dst FROM $pe e
         |  JOIN k$r a ON e.src = a.node JOIN k$r b ON e.dst = b.node),
         |m$r AS (SELECT $r AS round, (SELECT count(*) FROM k$r) AS n_nodes,
         |  (SELECT count(*) FROM e$r) AS n_pairs)""".stripMargin
    }.mkString(",\n")
    val union = (1 to KcoreMaxRounds).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS src, l.l_partkey + 10000000 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |n0 AS (SELECT count(*) AS n FROM (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0))),
       |$rounds,
       |alld AS (SELECT round, n_nodes, n_pairs,
       |  coalesce(lag(n_nodes) OVER (ORDER BY round), (SELECT n FROM n0)) AS prev
       |  FROM ($union))
       |SELECT CAST(round AS BIGINT) AS round, CAST(n_nodes AS BIGINT) AS n_nodes,
       |  CAST(n_pairs AS BIGINT) AS n_pairs
       |FROM alld WHERE n_nodes < prev ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------
  // SHARD-LOCAL DEDUP COVERAGE — the design-decision audit behind
  // "can we dedup within shards and skip the global shuffle?": for
  // each candidate shard count, how many of the corpus's near-dup
  // pairs land with BOTH members in one shard (id-hash sharding)
  // versus straddling shards — the pairs shard-local dedup would
  // MISS. The cross-shard fraction is the exact price of locality,
  // per-mille, the number a 100 TB pipeline weighs against the
  // global-shuffle cost before choosing. One pass over the memoized
  // pair list (fixed-width longs) × a 4-row broadcast of shard
  // counts; no text anywhere.
  private val ShardSweep = Seq(4L, 8L, 16L, 32L)

  def qShardLocal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = lshPairs(s, dir)
    pairs.crossJoin(broadcast(ShardSweep.toDF("n_shards")))
      .groupBy(col("n_shards"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("doc_a") % col("n_shards") === col("doc_b") % col("n_shards"), 1L)
          .otherwise(0L)).as("n_within"))
      .select(col("n_shards"), col("n_pairs"), col("n_within"),
        (col("n_pairs") - col("n_within")).as("n_cross"),
        expr("(n_pairs - n_within) * 1000 div greatest(n_pairs, 1)").as("missed_pm"))
      .orderBy(col("n_shards"))
  }

  lazy val qShardLocalSql: String =
    s"""WITH pr AS MATERIALIZED (
SELECT doc_a, doc_b FROM (
$qMinHashLshSql
)),
sw AS (SELECT unnest([${ShardSweep.mkString(", ")}]) AS n_shards),
agg AS (SELECT s.n_shards, count(*) AS n_pairs,
  CAST(sum(CASE WHEN p.doc_a % s.n_shards = p.doc_b % s.n_shards THEN 1 ELSE 0 END) AS BIGINT) AS n_within
  FROM pr p, sw s GROUP BY s.n_shards)
SELECT CAST(n_shards AS BIGINT) AS n_shards, CAST(n_pairs AS BIGINT) AS n_pairs,
  n_within, CAST(n_pairs - n_within AS BIGINT) AS n_cross,
  CAST((n_pairs - n_within) * 1000 // greatest(n_pairs, 1) AS BIGINT) AS missed_pm
FROM agg ORDER BY n_shards"""

  // ---------------------------------------------------------------
  // QUALITY-AWARE CANONICAL PICK — [[qCanonical]]'s representative
  // rule upgraded from "longest text" to "best LANGUAGE-MODEL score"
  // (ties: longer, then smaller id): when a near-dup cluster mixes a
  // clean copy with boilerplate-damaged variants, the length rule
  // keeps the most padded one, the quality rule keeps the one the
  // training run actually wants — the selection modern dedup
  // pipelines run. Composes [[clusterLabels]] with
  // [[Text.lmScored]]'s exact integer-ppm bigram score; the argmax
  // stays a PARTIAL map-side max(struct) over fixed-width ints (no
  // window, one candidate per cluster per partition reaches the
  // shuffle). Cold cost is honestly LSH+CC+LM — the composite class.
  def qCanonicalQuality(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(s, dir)
    val scored = Text.lmScored(s, dir).select(col("doc_id"), col("lm_score_ppm"))
    Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"))
      .join(scored, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("lm_score_ppm").as("q"), col("n_chars").as("c"),
          (-col("doc_id")).as("negid"))).as("best"))
      .select(
        col("cluster_id"),
        (-col("best.negid")).as("kept_doc"),
        col("best.q").as("kept_lm_ppm"),
        col("best.c").as("kept_chars"),
        col("n_members"))
      .orderBy(col("cluster_id"))
  }

  lazy val qCanonicalQualitySql: String =
    s"""WITH labels AS (
$qClustersSql
),
scored AS (
${Text.qLmScoreSql}
),
j AS (SELECT l.cluster_id, d.doc_id, d.n_chars, sc.lm_score_ppm
  FROM labels l JOIN documents d USING (doc_id) JOIN scored sc USING (doc_id)),
m AS (SELECT cluster_id, count(*) AS n_members FROM j GROUP BY cluster_id)
SELECT j.cluster_id, j.doc_id AS kept_doc, j.lm_score_ppm AS kept_lm_ppm,
  CAST(j.n_chars AS BIGINT) AS kept_chars, CAST(m.n_members AS BIGINT) AS n_members
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
    ORDER BY lm_score_ppm DESC, n_chars DESC, doc_id) AS rn FROM j) j
JOIN m USING (cluster_id) WHERE j.rn = 1 ORDER BY j.cluster_id"""

  val qCanonicalSql: String =
    s"""WITH labels AS (
       |$qClustersSql
       |),
       |j AS (
       |  SELECT l.cluster_id, d.doc_id, d.n_chars
       |  FROM labels l JOIN documents d USING (doc_id)
       |)
       |SELECT cluster_id, doc_id AS kept_doc, n_chars AS kept_chars, n_members
       |FROM (
       |  SELECT cluster_id, doc_id, n_chars,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_chars DESC, doc_id ASC) AS rn
       |  FROM j)
       |WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------
  // FUZZY entity matching (record linkage): typo-tolerant near-dup
  // detection on short strings via edit distance — the classic
  // blocked-join shape. All-pairs levenshtein is quadratic, so
  // candidates come from an equi-join on a BLOCKING key (brand here;
  // in a name-matching pipeline: phonetic code / prefix / sorted
  // tokens) plus a cheap length-band prune (|len(a)-len(b)| <= d is
  // necessary for distance <= d) that runs before the O(n*m) distance
  // in the same codegen'd stage. Blocks bound the quadratic term;
  // at 100 TB the block key IS the shuffle key and each block
  // computes independently. Both engines implement classic
  // unit-cost Levenshtein, so values agree exactly.
  private val FuzzyMaxDist = 2

  // The block key composes EVERY reliable exact attribute —
  // (brand, size) here — which is the lever that keeps blocked
  // linkage subquadratic: brand alone left 800-row blocks (16M pair
  // evaluations, 25.6s at sf0.1); adding size gives 1250 blocks of
  // ≤28 rows (340k pairs, ~50x less). The cheap length-band prune
  // (|len(a)-len(b)| <= d is necessary for dist <= d) runs first in
  // the same codegen'd stage, and the distance is the THRESHOLDED
  // levenshtein (early-exits at O(d·n), returns -1 above the bound).
  def qFuzzyNames(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "p_size"))
      .filter(col("key_a") < col("key_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= FuzzyMaxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), FuzzyMaxDist))
      .filter(col("dist") >= 0 && col("dist") <= FuzzyMaxDist)
      .select(col("p_brand"), col("p_size"), col("key_a"), col("key_b"), col("dist"))
      .orderBy(col("p_brand"), col("p_size"), col("key_a"), col("key_b"))
  }

  val qFuzzyNamesSql: String =
    s"""SELECT a.p_brand, a.p_size, a.p_partkey AS key_a, b.p_partkey AS key_b,
       |  levenshtein(a.p_name, b.p_name) AS dist
       |FROM part a JOIN part b
       |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
       | AND abs(length(a.p_name) - length(b.p_name)) <= $FuzzyMaxDist
       |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
       |ORDER BY a.p_brand, a.p_size, key_a, key_b""".stripMargin

  // ---------------------------------------------------------------
  // SUBSTRING-level dedup signal (the gram-granular equivalent of
  // suffix-array substring dedup, Lee et al. "Deduplicating Training
  // Data Makes Language Models Better"): per document, the fraction
  // of its distinct word-8-grams that also occur in at least one
  // OTHER document. Unlike the whole-doc MinHash/SimHash family this
  // catches partial overlap — boilerplate paragraphs, quoted spans,
  // template text — and is the signal a pipeline uses to CUT spans
  // rather than drop documents.
  //
  // Scale shape: grams hash to 60-bit longs in the shared per-
  // partition kernel ([[Text.gramHashes]] — split once, slide, one
  // md5 per gram), so the exploded gram table is fixed-width
  // (doc_id, gram_h) — text never shuffles. The per-gram document
  // count is a window over gram_h on that ONE gram table: the
  // count-attach-via-join form plans the kernel subtree under BOTH
  // join children (verified in the executed plan — no ReusedExchange
  // fires because only the counts child exchanges), i.e. two full
  // corpus scans + two kernel passes at 100 TB; the window form
  // shuffles the gram table once and re-reads nothing. The per-gram
  // sort it adds orders near-unique 60-bit keys inside each
  // partition — fixed-width rows, linear-ish runs — which is cheaper
  // than a second corpus scan at any scale that matters. Final
  // per-doc rollup is a fixed-width partial aggregate.
  //
  // Gram length 8 separates cleanly on this corpus: planted near-dup
  // documents score dup_frac ≈ 1, independent text scores 0 (8 words
  // from a ~40-word vocabulary collide with probability ~40^-8).
  private val SubstrGramLen = 8
  private val SubstrFlagFrac = 0.5

  def qSubstring(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Text.gramHashes(s, dir, SubstrGramLen) // (doc_id, gram_h), distinct per doc
    // AQE coalesces the window's gram_h exchange to ~3 tasks at this
    // SF — measured as the RIGHT call here, unlike the CPU-heavy
    // kernel stages: pinning 32-way with repartition(N, gram_h) cost
    // 1.8s vs 1.4s because the per-task radix-sort buffer setup
    // dominates tiny sorted partitions. At real scale the gram table
    // is large-bytes and AQE sizes the stage normally.
    g.withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("gram_h"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum((col("n_docs") > 1).cast("int")).cast("long").as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup").cast("double") / col("n_grams"), 4))
      .withColumn("flagged",
        when(col("n_dup").cast("double") / col("n_grams") >= SubstrFlagFrac, lit(1))
          .otherwise(lit(0)))
      .select(col("doc_id"), col("n_grams"), col("n_dup"), col("dup_frac"), col("flagged"))
      .orderBy(col("doc_id"))
  }

  val qSubstringSql: String = {
    val n = SubstrGramLen
    val terms = (1 to n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
       |g AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= $n
       |    THEN list_transform(range(len(ws) - ${n - 1}), i -> $terms)
       |    ELSE [array_to_string(ws, ' ')] END) AS grams FROM w),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |c AS (SELECT gram, count(*) AS n_docs FROM e GROUP BY gram)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_frac,
       |  CASE WHEN sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) >= $SubstrFlagFrac
       |       THEN 1 ELSE 0 END AS flagged
       |FROM e JOIN c USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // EXCERPT / CONTAINMENT DETECTION — the asymmetric near-dup case
  // every symmetric family above structurally misses: a SHORT
  // fragment quoted inside a LONG document has Jaccard ≈
  // |frag|/|doc| (far below any LSH threshold, and minhash bands
  // rarely collide when one signature is dominated by the host's
  // extra shingles), but containment |A∩B|/|A| ≈ 1. Probes are
  // deterministic excerpt stand-ins — the first max(len/3, 3) words
  // of every SnipMod-th document (the qIncremental batch-split
  // precedent); candidates come from a DOCUMENT-FREQUENCY-CAPPED
  // inverted shingle index (a snippet shingle appearing in ≤ cap
  // corpus docs nominates those docs — the winnow DF-cap discipline,
  // so hot shingles never fan out), requiring ≥ MinRare independent
  // rare hits before the exact verify. The cap is CORPUS-RELATIVE —
  // greatest(4, n_docs div 100), i.e. "appears in ≤1% of documents"
  // — because an absolute cap does not survive scale-up: this
  // corpus's 31-word vocabulary saturates the shingle space (median
  // shingle df 9 at sf0.1), and a fixed cap of 4 left the index
  // EMPTY there (measured: 0 candidates at sf0.1/10×). The relative
  // cap bounds worst-case fan-out at probe_shingles × 1% of docs —
  // the bound that matters at 100 TB, where absolute dfs grow with
  // the corpus but "rare relative to the corpus" is the actual
  // excerpt-source signal. Gated: exact overlap,
  // containment and Jaccard in integer per-mille, and the
  // excerpt_flag (containment ≥ 800‰ while Jaccard < 500‰) — every
  // emitted row on this corpus demonstrates precisely the
  // high-containment/low-Jaccard signature LSH cannot see.
  //
  // Scale shape: the corpus shingle table streams once into the
  // df-capped index (8-byte-key aggregates); the snippet batch is
  // ~|corpus|/SnipMod docs' first thirds and BROADCASTS (the
  // incremental-dedup orientation — the corpus is never self-joined,
  // candidate count is bounded by batch fan-out × DfCap); the exact
  // verify streams the corpus table once more against the broadcast
  // candidate list + snippet hash sets. All joins carry fixed-width
  // longs; nothing pair-quadratic anywhere.
  private val SnipMod = 5L
  private val ContainMinRare = 2

  def qContainment(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // 1-row driver metadata (the PQ-codebook-collect class): the
    // corpus-relative df cap
    val dfCap = math.max(4L, Tables.documents(s, dir).count() / 100)
    // corpus distinct (doc_id, h) — one kernel pass, three consumers
    val ds = Sketches.docShingleHashes(s, dir).select(col("doc_id"), col("h"))
      .localCheckpoint()
    val snSchema = StructType(Seq(
      StructField("snip_doc", LongType), StructField("h", LongType)))
    val snds = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % SnipMod === 0)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val ws = Text.duckWords(r.getString(1))
          val sws = ws.take(math.max(ws.length / 3, 3))
          val seen = new java.util.HashSet[Long]()
          shinglesOf(sws).flatMap { x =>
            val h = md5Mod(md, x, Long.MaxValue) >> 12
            if (seen.add(h)) Some(Row(r.getLong(0), h)) else None
          }
        }
      }(Encoders.row(snSchema))
      .localCheckpoint()
    val di = ds.join(
      ds.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select(col("h")),
      Seq("h"))
    val cand = di.join(broadcast(snds), Seq("h"))
      .filter(col("snip_doc") =!= col("doc_id"))
      .groupBy(col("snip_doc"), col("doc_id").as("host_doc"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") >= ContainMinRare)
      .select(col("snip_doc"), col("host_doc"))
      .localCheckpoint() // audit-sized; the verify below streams ds once
    val sn2 = snds.select(col("snip_doc").as("sd"), col("h").as("h2"))
    val ov = ds.join(broadcast(cand), ds("doc_id") === cand("host_doc"))
      .join(broadcast(sn2), col("sd") === col("snip_doc") && col("h2") === col("h"))
      .groupBy(col("snip_doc"), col("host_doc"))
      .agg(count(lit(1)).as("n_overlap"))
    val sz = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val snsz = snds.groupBy(col("snip_doc")).agg(count(lit(1)).as("n_sn"))
    val ovj = ov.join(broadcast(snsz), Seq("snip_doc"))
    sz.join(broadcast(ovj), sz("doc_id") === ovj("host_doc"))
      .filter(expr("n_overlap * 1000 div n_sn") >= 800)
      .select(col("snip_doc"), col("host_doc"), col("n_sn"), col("n_sh"), col("n_overlap"),
        expr("n_overlap * 1000 div n_sn").as("contain_pm"),
        expr("n_overlap * 1000 div (n_sn + n_sh - n_overlap)").as("jaccard_pm"))
      .withColumn("excerpt_flag",
        when(col("contain_pm") >= 800 && col("jaccard_pm") < 500, 1L).otherwise(0L))
      // checkpointed before the sort for the same winnow-pairs
      // reason: the verify's corpus-streaming aggregations must run
      // once, not once more for range sampling
      .localCheckpoint()
      .orderBy(col("snip_doc"), col("host_doc"))
  }

  val qContainmentSql: String =
    s"""WITH $shinglesSqlCte,
       |ds AS MATERIALIZED (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
       |sn0 AS (SELECT doc_id, ws[1:greatest(len(ws)//3, 3)] AS sws FROM w WHERE doc_id % $SnipMod = 0),
       |snsh AS (SELECT doc_id,
       |  CASE WHEN len(sws) >= 3
       |       THEN list_transform(range(len(sws) - 2), i -> sws[i+1] || ' ' || sws[i+2] || ' ' || sws[i+3])
       |       ELSE [array_to_string(sws, ' ')] END AS shingles FROM sn0),
       |snds AS MATERIALIZED (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM snsh)),
       |snsz AS (SELECT doc_id, count(*) AS n_sn FROM snds GROUP BY doc_id),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
       |idx AS (SELECT h FROM ds GROUP BY h
       |  HAVING count(*) <= greatest(4, (SELECT count(*) FROM documents) // 100)),
       |di AS (SELECT d.doc_id, d.h FROM ds d JOIN idx USING (h)),
       |cand AS (SELECT s.doc_id AS snip_doc, d.doc_id AS host_doc
       |  FROM snds s JOIN di d ON s.h = d.h AND s.doc_id <> d.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $ContainMinRare),
       |ov AS (SELECT c.snip_doc, c.host_doc, count(*) AS n_overlap
       |  FROM cand c JOIN snds a ON a.doc_id = c.snip_doc
       |  JOIN ds b ON b.doc_id = c.host_doc AND b.h = a.h
       |  GROUP BY 1, 2)
       |SELECT o.snip_doc, o.host_doc, CAST(ss.n_sn AS BIGINT) AS n_sn, CAST(z.n_sh AS BIGINT) AS n_sh,
       |  CAST(o.n_overlap AS BIGINT) AS n_overlap,
       |  CAST(o.n_overlap * 1000 // ss.n_sn AS BIGINT) AS contain_pm,
       |  CAST(o.n_overlap * 1000 // (ss.n_sn + z.n_sh - o.n_overlap) AS BIGINT) AS jaccard_pm,
       |  CAST(CASE WHEN o.n_overlap * 1000 // ss.n_sn >= 800
       |    AND o.n_overlap * 1000 // (ss.n_sn + z.n_sh - o.n_overlap) < 500
       |    THEN 1 ELSE 0 END AS BIGINT) AS excerpt_flag
       |FROM ov o JOIN snsz ss ON ss.doc_id = o.snip_doc JOIN sz z ON z.doc_id = o.host_doc
       |WHERE o.n_overlap * 1000 // ss.n_sn >= 800
       |ORDER BY snip_doc, host_doc""".stripMargin

  // ---------------------------------------------------------------
  // ENSEMBLE DEDUP — the resolution a production pipeline actually
  // runs: no single near-dup family is trusted alone; the five pair
  // lists (MinHash word-shingle LSH, SimHash hamming, char-n-gram
  // Jaccard LSH, winnowing containment, embedding cosine — vec_id and
  // doc_id share one id space in the corpus) UNION into one evidence
  // graph, each edge carrying a provenance BITMASK of the families
  // that found it, and connected components resolve ONCE over the
  // union. The gated table is per-cluster provenance: how many
  // clusters rest on a single family's word (mask with one bit) vs
  // corroborated by independent signals — the quality measure that
  // decides whether a dedup sweep can be trusted to DELETE data.
  //
  // Scale shape: each family is its own banded/capped pipeline (no
  // all-pairs anywhere); the union is pair-count-bounded fixed-width
  // rows; the resolution reuses [[resolveComponents]] (O(log d)
  // rounds of long-key joins). Cold cost is inherently the sum of the
  // five family pipelines — the composite-query class of
  // pipeline_e2e, not a plan defect. All gated values are exact
  // integers (masks, counts, bit_count).
  private val EnsembleFams: Seq[(String, Long, (SparkSession, String) => DataFrame)] = Seq(
    ("minhash", 1L, (s: SparkSession, d: String) =>
      qMinHashLsh(s, d).select(col("doc_a"), col("doc_b"))),
    ("simhash", 2L, (s: SparkSession, d: String) =>
      qSimHashPairs(s, d).select(col("doc_a"), col("doc_b"))),
    ("ngram", 4L, (s: SparkSession, d: String) =>
      qNgramJaccard(s, d).select(col("doc_a"), col("doc_b"))),
    ("winnow", 8L, (s: SparkSession, d: String) =>
      winnowPairsUnsorted(s, d).select(col("doc_a"), col("doc_b"))),
    ("embed", 16L, (s: SparkSession, d: String) =>
      qEmbedCosine(s, d).select(col("ia").as("doc_a"), col("ib").as("doc_b"))))

  /** Union evidence graph: one row per pair with the provenance
    * bitmask of the families that found it.
    *
    * Concurrency here is BASE-ONLY — measured, not guessed (r9 A/B
    * table in PLANS.md, Bench harness min-of-2 at sf0.1): running the
    * five FULL family pipelines on five concurrent threads regressed
    * 7.75s → 18.6s (each family's kernels are width-pinned to the
    * full machine, so cross-family pipeline concurrency
    * oversubscribes the executor — the sampler showed `Unsafe.park`,
    * broadcast-build `KeyLock` contention and tiny-shuffle
    * `DiskBlockObjectWriter` churn, not compute; two-at-a-time still
    * read 11.9s). The per-family signature BASES are different: they
    * are scan→repartition→kernel jobs with no banded joins, so
    * warming the five [[memoBase]] checkpoints concurrently overlaps
    * the serialized CPU-heavy prefix without the join-machinery
    * contention. Family pipelines then build sequentially on the
    * warmed bases, and the lazy union evaluates as one job whose
    * independent banded subtrees Spark's DAG scheduler interleaves at
    * the stage level. Edge rows are pair-count-bounded fixed width. */
  private[graft] def ensembleEdges(s: SparkSession, dir: String): DataFrame = {
    warmPinnedBases(s, dir)
    EnsembleFams.map { case (name, bit, fn) =>
      compositeMemo(s"fam_pairs_$name", s, dir)(fn(s, dir))
        .select(col("doc_a"), col("doc_b"), lit(bit).as("fam"))
    }.reduce(_ unionAll _)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(bit_or(col("fam")).as("mask"))
  }

  def qDedupEnsemble(s: SparkSession, dir: String): DataFrame = {
    // materialized once: the edge list feeds the component resolution
    // (many iterations) AND the per-cluster stats join
    val edges = ensembleEdges(s, dir).localCheckpoint()
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val (labels, _) = resolveComponents(sym)
    val edgeCl = edges
      .join(labels.select(col("doc_id").as("doc_a"), col("cluster_id")), "doc_a")
    val perCluster = edgeCl.groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_edges"),
        bit_or(col("mask")).as("families_mask"),
        sum(when(bit_count(col("mask")) >= 2, 1L).otherwise(0L)).as("n_corroborated"))
    labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs"))
      .join(perCluster, "cluster_id")
      .select(col("cluster_id"), col("n_docs"), col("n_edges"),
        col("families_mask"),
        bit_count(col("families_mask")).cast("long").as("n_families"),
        col("n_corroborated"))
      .orderBy(col("cluster_id"))
  }

  val qDedupEnsembleSql: String = {
    val union = EnsembleFams.map { case (name, bit, _) =>
      val sql = name match {
        case "minhash" => qMinHashLshSql
        case "simhash" => qSimHashPairsSql
        case "ngram"   => qNgramJaccardSql
        case "winnow"  => qWinnowPairsSql
        // wrap, don't string-rewrite: a literal replace on the embed
        // family's SELECT list silently no-ops if that query is ever
        // reformatted, leaving doc_a/doc_b unbound at oracle run time
        case "embed"   => s"SELECT ia AS doc_a, ib AS doc_b FROM (\n$qEmbedCosineSql\n)"
      }
      s"SELECT doc_a, doc_b, $bit AS fam FROM (\n$sql\n)"
    }.mkString("\nUNION ALL ")
    // NO stripMargin on the wrapper: the embedded family SQL has
    // continuation lines beginning with `||`, whose first pipe an
    // outer stripMargin would eat
    s"""WITH fam AS (
$union
),
edges AS (SELECT doc_a, doc_b, CAST(bit_or(fam) AS BIGINT) AS mask FROM fam GROUP BY 1, 2),
sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges UNION SELECT doc_b, doc_a FROM edges),
reach AS (
  WITH RECURSIVE r(node, root) AS (
    SELECT src, src FROM sym
    UNION
    SELECT s.dst, r.root FROM r JOIN sym s ON s.src = r.node
  ) SELECT node, root FROM r
),
labels AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
ec AS (SELECT l.cluster_id, e.mask FROM edges e JOIN labels l ON e.doc_a = l.doc_id),
pc AS (SELECT cluster_id, count(*) AS n_edges,
    CAST(bit_or(mask) AS BIGINT) AS families_mask,
    CAST(sum(CASE WHEN bit_count(mask) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_corroborated
  FROM ec GROUP BY cluster_id),
sz AS (SELECT cluster_id, count(*) AS n_docs FROM labels GROUP BY cluster_id)
SELECT sz.cluster_id, CAST(sz.n_docs AS BIGINT) AS n_docs,
  CAST(pc.n_edges AS BIGINT) AS n_edges, pc.families_mask,
  CAST(bit_count(pc.families_mask) AS BIGINT) AS n_families, pc.n_corroborated
FROM sz JOIN pc USING (cluster_id) ORDER BY cluster_id"""
  }

  // ---------------------------------------------------------------
  // HITS ON THE CUSTOMER→PART CO-PURCHASE GRAPH — the hubs-and-
  // authorities twin of [[qPagerankStep]], on a graph where the
  // directed structure is real: customers (hubs) point at the parts
  // they order (authorities) through orders×lineitem. Two synchronous
  // half-steps from hub=1 with NO normalization — the classical
  // power iteration normalizes by the L2 norm (libm), so the gated
  // values are the exact INTEGER unnormalized scores (auth¹ = part
  // in-degree; hub² = Σ auth¹ over a customer's parts; auth² = Σ
  // hub² over a part's customers), whose ranking is identical to the
  // normalized iterate's. Scale shape: the edge list deduplicates to
  // (c, p) once (one shuffle), each half-step is a groupBy partial
  // agg plus a fixed-width join — the same shape GraphX's Pregel
  // would run, expressed relationally so Catalyst handles it; top-10
  // per side rides TakeOrderedAndProject.
  private val HitsTopN = 10

  /** The customer→part co-purchase bipartite edge list — the shared
    * base graph of the graph family (hits, hits_converge, pagerank,
    * kcore each consume it, previously re-deriving the
    * orders⋈lineitem distinct independently). Memoized per (session,
    * sfDir) like the signature bases: at scale the edge list IS a
    * materialized graph table built once per corpus snapshot.
    * Partitioned by c (= src for the offset consumers — aliasing
    * preserves the partitioning, so their loop-invariant reads plan
    * no extra exchange). */
  private[operators] def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    memoBase("copurchase", s, dir)(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey").as("c"))
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey").as("p")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("c"), col("p")).distinct()
        .repartition(CcPartitions, col("c")))

  // ---------------------------------------------------------------
  // COMMON-NEIGHBOR PART SIMILARITY — item-item collaborative
  // filtering's counting core on the co-purchase graph: two parts
  // are similar when many customers bought both. The self-join on
  // the customer key is the classic Σdeg² blowup, so the operator
  // CAPS the contributing customer degree (a customer with hundreds
  // of parts adds quadratic cost and near-zero per-pair signal —
  // the LSH bucket-cap discipline applied to a graph); the cap is
  // part of the contract and the oracle states the same. Top-N pairs
  // ride TakeOrderedAndProject under the total (n_common DESC, p_a,
  // p_b) order; jaccard per-mille over the capped part degrees is
  // exact integer. Scale shape: one degree partial-agg + semi-join
  // keeps only capped customers; the pair stream is fixed-width
  // (c, p_a, p_b) longs with map-side-combined counting.
  private val CnMaxCustDeg = 40L
  private val CnTopN = 20

  def qCommonNeighbors(s: SparkSession, dir: String): DataFrame = {
    val e = copurchaseEdges(s, dir)
    // checkpointed: the capped edge list feeds BOTH self-join sides
    // and the part-degree agg (three consumers of one filter pass)
    val capped = e.join(
        e.groupBy(col("c")).agg(count(lit(1)).as("d"))
          .filter(col("d") <= CnMaxCustDeg).select(col("c")),
        Seq("c"), "left_semi")
      .localCheckpoint()
    val deg = capped.groupBy(col("p")).agg(count(lit(1)).as("dp"))
    capped.select(col("c"), col("p").as("p_a"))
      .join(capped.select(col("c"), col("p").as("p_b")), Seq("c"))
      .filter(col("p_a") < col("p_b"))
      .groupBy(col("p_a"), col("p_b")).agg(count(lit(1)).as("n_common"))
      .join(deg.select(col("p").as("p_a"), col("dp").as("deg_a")), "p_a")
      .join(deg.select(col("p").as("p_b"), col("dp").as("deg_b")), "p_b")
      .select(col("p_a"), col("p_b"), col("n_common"), col("deg_a"), col("deg_b"),
        expr("1000 * n_common div (deg_a + deg_b - n_common)").as("jaccard_pm"))
      .orderBy(col("n_common").desc, col("p_a"), col("p_b"))
      .limit(CnTopN)
  }

  val qCommonNeighborsSql: String =
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ok AS (SELECT c FROM (SELECT c, count(*) AS d FROM e GROUP BY c) WHERE d <= $CnMaxCustDeg),
       |ce AS MATERIALIZED (SELECT e.c, e.p FROM e JOIN ok USING (c)),
       |deg AS (SELECT p, count(*) AS dp FROM ce GROUP BY p),
       |pr AS (SELECT a.p AS p_a, b.p AS p_b, count(*) AS n_common
       |  FROM ce a JOIN ce b ON a.c = b.c AND a.p < b.p GROUP BY 1, 2),
       |j AS (SELECT pr.p_a, pr.p_b, pr.n_common, da.dp AS deg_a, db.dp AS deg_b
       |  FROM pr JOIN deg da ON da.p = pr.p_a JOIN deg db ON db.p = pr.p_b),
       |r AS (SELECT j.*, ROW_NUMBER() OVER (ORDER BY n_common DESC, p_a, p_b) AS rn FROM j)
       |SELECT CAST(p_a AS BIGINT) AS p_a, CAST(p_b AS BIGINT) AS p_b,
       |  CAST(n_common AS BIGINT) AS n_common, CAST(deg_a AS BIGINT) AS deg_a,
       |  CAST(deg_b AS BIGINT) AS deg_b,
       |  CAST(1000 * n_common // (deg_a + deg_b - n_common) AS BIGINT) AS jaccard_pm
       |FROM r WHERE rn <= $CnTopN ORDER BY n_common DESC, p_a, p_b""".stripMargin

  // ---------------------------------------------------------------
  // LINK PREDICTION — RESOURCE ALLOCATION INDEX (Zhou/Lü/Zhang
  // 2009): the libm-free twin of Adamic–Adar that production link
  // predictors rank candidate edges by. For part pairs sharing
  // customers, RA(a,b) = Σ_{c ∈ N(a)∩N(b)} 1/deg(c) — a shared RARE
  // customer is strong evidence, a shared hub is weak. Where
  // [[qCommonNeighbors]] counts overlap and Jaccard-normalizes by
  // the pair's own degrees, RA weights each WITNESS by its
  // selectivity — the two rankings disagree exactly on hub-witnessed
  // pairs, which is why feature stores ship both. 1/deg rides as the
  // exact integer 10⁶ div deg per (customer, part) edge BEFORE the
  // pair join (deg ≥ 1, non-negative div), so the pair score is a
  // plain BIGINT sum — no doubles, no libm, no -0.0 class.
  //
  // Scale shape: identical to qCommonNeighbors (one capped
  // checkpointed edge list feeds the degree agg and both self-join
  // sides; the cap bounds per-customer fan-out at deg² pair rows);
  // the witness weight is attached map-side to the EDGE list (fixed
  // width), never to pairs — the r9 orientation lesson.
  def qLinkPredict(s: SparkSession, dir: String): DataFrame = {
    val e = copurchaseEdges(s, dir)
    val dc = e.groupBy(col("c")).agg(count(lit(1)).as("d"))
    val w = e.join(dc, "c")
      .filter(col("d") <= CnMaxCustDeg)
      .select(col("c"), col("p"), expr("1000000 div d").as("wc"))
      .localCheckpoint() // feeds both self-join sides
    w.select(col("c"), col("p").as("p_a"), col("wc"))
      .join(w.select(col("c"), col("p").as("p_b")), Seq("c"))
      .filter(col("p_a") < col("p_b"))
      .groupBy(col("p_a"), col("p_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("wc")).as("ra_e6"))
      .orderBy(col("ra_e6").desc, col("p_a"), col("p_b"))
      .limit(CnTopN * 5)
  }

  val qLinkPredictSql: String =
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |dc AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY c),
       |w AS MATERIALIZED (SELECT e.c, e.p, CAST(1000000 // dc.d AS BIGINT) AS wc
       |  FROM e JOIN dc USING (c) WHERE dc.d <= $CnMaxCustDeg),
       |pr AS (SELECT a.p AS p_a, b.p AS p_b, CAST(count(*) AS BIGINT) AS n_common,
       |    CAST(sum(a.wc) AS BIGINT) AS ra_e6
       |  FROM w a JOIN w b ON a.c = b.c AND a.p < b.p GROUP BY 1, 2),
       |r AS (SELECT pr.*, ROW_NUMBER() OVER (ORDER BY ra_e6 DESC, p_a, p_b) AS rn FROM pr)
       |SELECT CAST(p_a AS BIGINT) AS p_a, CAST(p_b AS BIGINT) AS p_b, n_common, ra_e6
       |FROM r WHERE rn <= ${CnTopN * 5} ORDER BY ra_e6 DESC, p_a, p_b""".stripMargin

  // ---------------------------------------------------------------
  // DEGREE ASSORTATIVITY — the bipartite mixing audit: across the
  // co-purchase EDGES, does a high-degree customer connect to
  // high-degree (popular) parts? Pearson correlation of the endpoint
  // degrees (deg(c), deg(p)) per edge — positive = assortative
  // (heavy buyers chase bestsellers: hub-hub shuffle skew, the pairs
  // that blow up Σdeg² self-joins), negative = disassortative (hubs
  // fan out to the tail). This is the ONE number to read before
  // picking the [[qCommonNeighbors]] degree cap or a salting plan —
  // assortative graphs concentrate join work on hub×hub cells.
  // Exact-moment correlation (the q35 discipline: moments accumulate
  // order-free as DECIMAL(38,0)/HUGEINT, the closed form is one
  // fixed double chain over exact inputs, 4-dp round; means gate as
  // integer per-mille through decimal `div`). Scale shape: the
  // degree aggregates reuse the memo's c-partitioning (dc is
  // exchange-free), one shuffle on p for the dy attach, then a
  // map-side total aggregate to a single row.
  def qDegreeAssort(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = copurchaseEdges(s, dir)
    val dc = e.groupBy(col("c")).agg(count(lit(1)).as("dx"))
    val dp = e.groupBy(col("p")).agg(count(lit(1)).as("dy"))
    val m = e.join(dc, "c").join(dp, "p")
      .agg(count(lit(1)).as("n"),
        sum(col("dx").cast(dec)).as("sx"),
        sum(col("dy").cast(dec)).as("sy"),
        // one operand widened BEFORE the product (the oracle
        // multiplies as dx::HUGEINT * dy): a hub degree > ~3e9 would
        // wrap the raw BIGINT per-row product on this side only
        sum(col("dx").cast(dec) * col("dy")).as("sxy"),
        sum(col("dx").cast(dec) * col("dx")).as("sxx"),
        sum(col("dy").cast(dec) * col("dy")).as("syy"))
    val nD = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    m.select(col("n").as("n_edges"),
        expr("cast(1000 * sx div n as bigint)").as("mean_cust_deg_pm"),
        expr("cast(1000 * sy div n as bigint)").as("mean_part_deg_pm"),
        // + 0.0: IEEE -0.0 normalization (sign-capable correlation;
        // mirrored in the oracle — r11 ml_corr_pairs lesson)
        (round((nD * sxy - sx * sy) /
          (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy)), 4) + lit(0.0))
          .as("assortativity"))
  }

  val qDegreeAssortSql: String =
    """WITH e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |dc AS (SELECT c, count(*) AS dx FROM e GROUP BY c),
      |dp AS (SELECT p, count(*) AS dy FROM e GROUP BY p),
      |j AS (SELECT dx, dy FROM e JOIN dc USING (c) JOIN dp USING (p)),
      |m AS (SELECT count(*) AS n, sum(dx::HUGEINT) AS sx, sum(dy::HUGEINT) AS sy,
      |  sum(dx::HUGEINT * dy) AS sxy, sum(dx::HUGEINT * dx) AS sxx,
      |  sum(dy::HUGEINT * dy) AS syy FROM j)
      |SELECT CAST(n AS BIGINT) AS n_edges,
      |  CAST(1000 * sx // n AS BIGINT) AS mean_cust_deg_pm,
      |  CAST(1000 * sy // n AS BIGINT) AS mean_part_deg_pm,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |    (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
      |     sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4) + 0.0 AS assortativity
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // CROSS-SOURCE SYNDICATION MATRIX — where near-duplicate content
  // FLOWS between sources: for each unordered source pair, the count
  // of verified near-dup pairs connecting them. The diagonal is
  // within-source duplication (template reuse); off-diagonal mass is
  // carried/syndicated content — the corpus-level view whose
  // per-cluster twin is [[qClusterPurity]]. Scale shape: the
  // audit-sized pair list fetch-joins the per-doc source column with
  // `shuffle_hash` pinned on the pair side (the corpus table
  // STREAMS; the qEmbedCosine join-form orientation); the matrix is
  // |sources|²-bounded metadata.
  def qSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    lshPairs(s, dir)
      .hint("shuffle_hash")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .hint("shuffle_hash")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", (col("source_a") =!= col("source_b")).cast("long"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // composed without stripMargin: embeds the already-stripped LSH SQL
  lazy val qSourceMatrixSql: String =
    s"""WITH p AS MATERIALIZED (
SELECT doc_a, doc_b FROM (
$qMinHashLshSql
)),
sdoc AS (SELECT doc_id, source FROM documents),
j AS (SELECT least(a.source, b.source) AS source_a, greatest(a.source, b.source) AS source_b
  FROM p JOIN sdoc a ON p.doc_a = a.doc_id JOIN sdoc b ON p.doc_b = b.doc_id)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(CASE WHEN source_a <> source_b THEN 1 ELSE 0 END AS BIGINT) AS cross_source
FROM j GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---------------------------------------------------------------
  // SOURCE MODULARITY OF THE NEAR-DUP GRAPH — the normalized
  // complement of [[qSourceMatrix]]'s raw counts: Newman modularity
  // of the near-dup edge set under the SOURCE partition. Per source,
  // Q_c = e_c/m − (d_c/2m)² — positive contribution means the
  // source's documents near-duplicate each OTHER more than degree
  // chance predicts (template farms), mass lost to the cross terms
  // is syndication. Exact rational out: contrib_ppm = sign-split
  // 10⁶·(4m·e_c − d_c²) div 4m² through DECIMAL(38,0)/HUGEINT (the
  // overflow convention — d_c² grows with pair density), zero-edge
  // guard via greatest(m,1) on both engines. Scale shape: the
  // audit-sized pair list fetch-joins the per-doc source column with
  // `shuffle_hash` pinned on the pair side (the corpus table
  // streams); degrees come from the pair list alone; the rollup is
  // |sources|-bounded metadata and m rides a 1-row broadcast.
  def qSourceModularity(s: SparkSession, dir: String): DataFrame = {
    val pairs = lshPairs(s, dir)
    val sd = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val tot = pairs.agg(count(lit(1)).as("m"))
    val ei = pairs
      .hint("shuffle_hash")
      .join(sd.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .hint("shuffle_hash")
      .join(sd.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .filter(col("sa") === col("sb"))
      .select(col("sa").as("source"))
      .groupBy("source").agg(count(lit(1)).as("e_intra"))
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("dg"))
    val ds = sd.join(deg, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), coalesce(sum(col("dg")), lit(0L)).as("d_sum"))
    ds.join(ei, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_sum"))
      .crossJoin(broadcast(tot))
      .withColumn("num", expr(
        "cast(4 as decimal(38,0)) * m * e_intra - cast(d_sum as decimal(38,0)) * d_sum"))
      .withColumn("den", expr(
        "cast(4 as decimal(38,0)) * greatest(m, 1) * greatest(m, 1)"))
      .select(col("source"), col("n_docs"), col("e_intra"), col("d_sum"),
        expr("cast(CASE WHEN num >= 0 THEN (cast(1000000 as decimal(38,0)) * num) div den" +
          " ELSE -((cast(1000000 as decimal(38,0)) * (-num)) div den) END as bigint)")
          .as("contrib_ppm"))
      .orderBy(col("source"))
  }

  // composed without stripMargin: embeds the already-stripped LSH SQL
  lazy val qSourceModularitySql: String =
    s"""WITH p AS MATERIALIZED (SELECT doc_a, doc_b FROM (
$qMinHashLshSql
)),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
sd AS (SELECT doc_id, source FROM documents),
ei AS (SELECT a.source, CAST(count(*) AS BIGINT) AS e_intra
  FROM p JOIN sd a ON p.doc_a = a.doc_id JOIN sd b ON p.doc_b = b.doc_id
  WHERE a.source = b.source GROUP BY 1),
deg AS (SELECT doc_id, count(*) AS dg FROM (
  SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p) GROUP BY 1),
ds AS (SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(coalesce(sum(d.dg), 0) AS BIGINT) AS d_sum
  FROM sd s LEFT JOIN deg d USING (doc_id) GROUP BY 1),
f AS (SELECT ds.source, ds.n_docs, CAST(coalesce(ei.e_intra, 0) AS BIGINT) AS e_intra,
  ds.d_sum FROM ds LEFT JOIN ei USING (source)),
n AS (SELECT source, n_docs, e_intra, d_sum,
  4::HUGEINT * m * e_intra - d_sum::HUGEINT * d_sum AS num,
  4::HUGEINT * greatest(m, 1) * greatest(m, 1) AS den FROM f, mm)
SELECT source, n_docs, e_intra, d_sum,
  CAST(CASE WHEN num >= 0 THEN (1000000::HUGEINT * num) // den
    ELSE -((1000000::HUGEINT * (-num)) // den) END AS BIGINT) AS contrib_ppm
FROM n ORDER BY source"""

  // ---------------------------------------------------------------
  // LOUVAIN REFINEMENT STEP — one pass of the Louvain local-move
  // phase (Blondel et al. 2008) over the near-dup pair graph with
  // the SOURCE partition [[qSourceModularity]] scores: for every
  // document in the graph, the exact modularity gain of moving it
  // from its source-community A to each NEIGHBOR community B,
  //   gain·2m² = 2m·(k_{i,B} − k_{i,A}) − deg_i·(Σtot_B − Σtot_A + deg_i)
  // — all integers (degrees, neighbor-community counts, community
  // degree totals), widened to decimal(38,0)/HUGEINT for the 2m·k
  // products. A node moves iff its best gain is strictly positive
  // (ties to the lexicographically smallest target); the output is
  // the community TRANSITION MATRIX (from, to, n_docs, Σgain) — the
  // table a curation owner reads to see which sources near-dup
  // pressure actually wants merged. One local-move sweep is the
  // Louvain inner loop run once from a meaningful partition — the
  // iterated/agglomerated phases are driver loops over this exact
  // step (the qPagerankConverge discipline).
  //
  // Scale shape: the pair list is the memoized [[lshPairs]] audit
  // table; degrees and Σtot are one partial-agg each; candidate
  // gains are one exploded (node, neighbor-community) aggregate —
  // fixed-width keys, no arrays; the per-node argmax is a window
  // over the node's ≤|sources| candidate rows.
  def qLouvainStep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = lshPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val sd = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val m = pairs.agg(count(lit(1)).as("m"))
    val adj = pairs.select(col("doc_a").as("i"), col("doc_b").as("j"))
      .unionAll(pairs.select(col("doc_b").as("i"), col("doc_a").as("j")))
    val deg = adj.groupBy(col("i")).agg(count(lit(1)).as("dg"))
    val comm = sd.select(col("doc_id").as("i"), col("source").as("ci"))
    val sumtot = deg.join(comm, "i").groupBy(col("ci").as("c"))
      .agg(sum(col("dg")).as("stot"))
    // neighbor-community counts per node (k_{i,C})
    val nbc = adj.join(comm.select(col("i").as("j"), col("ci").as("cj")), "j")
      .groupBy(col("i"), col("cj")).agg(count(lit(1)).as("k_ic"))
      .localCheckpoint() // consumed twice: own-community k and candidates
    val base = comm.join(deg, "i")
      .join(nbc.select(col("i").as("oi"), col("cj").as("oc"), col("k_ic")),
        col("i") === col("oi") && col("ci") === col("oc"), "left")
      .select(col("i"), col("ci"), col("dg"),
        coalesce(col("k_ic"), lit(0L)).as("k_ia"))
      .join(sumtot.select(col("c").as("ci"), col("stot").as("stot_a")), "ci")
    val cand = base
      .join(broadcast(m))
      .join(nbc.select(col("i").as("ni"), col("cj").as("b"), col("k_ic").as("k_ib")),
        col("i") === col("ni") && col("ci") =!= col("b"))
      .join(sumtot.select(col("c").as("b"), col("stot").as("stot_b")), Seq("b"))
      .withColumn("gain", expr(
        "2 * cast(m as decimal(38,0)) * (k_ib - k_ia)" +
          " - cast(dg as decimal(38,0)) * (stot_b - stot_a + dg)"))
    val w = Window.partitionBy(col("i")).orderBy(col("gain").desc, col("b"))
    val best = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("i"), col("ci"), col("b"), col("gain"))
    val moves = deg.join(comm, "i")
      .join(best.select(col("i"), col("b"), col("gain")), Seq("i"), "left")
      .select(col("ci").as("from_source"),
        when(col("gain").isNotNull && col("gain") > 0, col("b"))
          .otherwise(col("ci")).as("to_source"),
        when(col("gain").isNotNull && col("gain") > 0, col("gain"))
          .otherwise(lit(java.math.BigDecimal.ZERO)).as("g"))
    moves.groupBy(col("from_source"), col("to_source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(sum(g) as bigint)").as("sum_gain_2m2"))
      .orderBy(col("from_source"), col("to_source"))
  }

  // composed without stripMargin: embeds the already-stripped LSH SQL
  lazy val qLouvainStepSql: String =
    s"""WITH p AS MATERIALIZED (SELECT doc_a, doc_b FROM (
$qMinHashLshSql
)),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
adj AS (SELECT doc_a AS i, doc_b AS j FROM p UNION ALL SELECT doc_b, doc_a FROM p),
deg AS (SELECT i, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY 1),
comm AS (SELECT doc_id AS i, source AS ci FROM documents),
sumtot AS (SELECT c.ci AS c, CAST(sum(d.dg) AS BIGINT) AS stot
  FROM deg d JOIN comm c USING (i) GROUP BY 1),
nbc AS (SELECT a.i, c.ci AS cj, CAST(count(*) AS BIGINT) AS k_ic
  FROM adj a JOIN comm c ON a.j = c.i GROUP BY 1, 2),
base AS (SELECT c.i, c.ci, d.dg, coalesce(n.k_ic, 0) AS k_ia, sa.stot AS stot_a
  FROM comm c JOIN deg d USING (i)
  LEFT JOIN nbc n ON n.i = c.i AND n.cj = c.ci
  JOIN sumtot sa ON sa.c = c.ci),
cand AS (SELECT b.i, b.ci, n.cj AS bt,
    2 * mm.m::HUGEINT * (n.k_ic - b.k_ia)
      - b.dg::HUGEINT * (sb.stot - b.stot_a + b.dg) AS gain
  FROM base b JOIN nbc n ON n.i = b.i AND n.cj <> b.ci
  JOIN sumtot sb ON sb.c = n.cj, mm),
best AS (SELECT i, ci, bt, gain FROM (
  SELECT i, ci, bt, gain,
    ROW_NUMBER() OVER (PARTITION BY i ORDER BY gain DESC, bt) AS rn FROM cand)
  WHERE rn = 1),
mv AS (SELECT c.ci AS from_source,
    CASE WHEN b.gain IS NOT NULL AND b.gain > 0 THEN b.bt ELSE c.ci END AS to_source,
    CASE WHEN b.gain IS NOT NULL AND b.gain > 0 THEN b.gain ELSE 0 END AS g
  FROM deg d JOIN comm c USING (i) LEFT JOIN best b ON b.i = d.i)
SELECT from_source, to_source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(g) AS BIGINT) AS sum_gain_2m2
FROM mv GROUP BY 1, 2 ORDER BY 1, 2"""

  def qHits(s: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(s, dir)
    val auth1 = edges.groupBy(col("p")).agg(count(lit(1)).cast("long").as("a1"))
    val hub2 = edges.join(auth1, "p")
      .groupBy(col("c")).agg(sum(col("a1")).cast("long").as("h2"))
    val auth2 = edges.join(hub2, "c")
      .groupBy(col("p")).agg(sum(col("h2")).cast("long").as("a2"))
    val topParts = auth2
      .orderBy(col("a2").desc, col("p")).limit(HitsTopN)
      .select(lit("part").as("side"), col("p").as("node"), col("a2").as("score"))
    val topCusts = hub2
      .orderBy(col("h2").desc, col("c")).limit(HitsTopN)
      .select(lit("cust").as("side"), col("c").as("node"), col("h2").as("score"))
    topCusts.unionAll(topParts)
      .orderBy(col("side"), col("score").desc, col("node"))
  }

  val qHitsSql: String =
    s"""WITH g AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |auth1 AS (SELECT p, CAST(count(*) AS BIGINT) AS a1 FROM g GROUP BY p),
       |hub2 AS (SELECT c, CAST(sum(a1) AS BIGINT) AS h2
       |  FROM g JOIN auth1 USING (p) GROUP BY c),
       |auth2 AS (SELECT p, CAST(sum(h2) AS BIGINT) AS a2
       |  FROM g JOIN hub2 USING (c) GROUP BY p),
       |tp AS (SELECT 'part' AS side, p AS node, a2 AS score,
       |  ROW_NUMBER() OVER (ORDER BY a2 DESC, p) AS rn FROM auth2),
       |tc AS (SELECT 'cust' AS side, c AS node, h2 AS score,
       |  ROW_NUMBER() OVER (ORDER BY h2 DESC, c) AS rn FROM hub2)
       |SELECT side, node, score FROM (
       |  SELECT side, node, score FROM tc WHERE rn <= $HitsTopN
       |  UNION ALL
       |  SELECT side, node, score FROM tp WHERE rn <= $HitsTopN)
       |ORDER BY side, score DESC, node""".stripMargin

  // ---------------------------------------------------------------
  // HITS TO CONVERGENCE — [[qHits]] runs two fixed half-steps; this
  // iterates the hub/authority sweep to a FIXPOINT in an exact
  // integer lattice, the CC pointer-jumping discipline applied to
  // scores: each round max-normalizes both sides to ppm (score·1e6
  // div max — the classical L2 normalization is libm; max-norm in
  // integer space preserves the ranking and keeps every gated value
  // exact), and the gated table is the per-round L1 DELTA of the two
  // score vectors — the convergence evidence itself. The loop stops
  // early when both deltas hit 0 (exact fixpoint) and is bounded at
  // [[HitsMaxRounds]]; the oracle unrolls the same rounds as chained
  // MATERIALIZED CTEs (the deep-oracle rule) and emits rows up to the
  // first zero-delta round, mirroring the early exit. Scale shape:
  // per round two co-partitioned join+groupBy sweeps over the
  // checkpointed edge list, a 1-row max broadcast, and metadata-only
  // delta aggregates — the qPagerankStep shape iterated, labels
  // checkpointed per round so plans don't grow. Normalization goes
  // through DECIMAL(38,0)/HUGEINT (raw·1e6 can pass Long at
  // 100 TB-scale degrees).
  // 6 rounds: the per-round L1 delta decays geometrically (~10×/round
  // on this graph — 833M → ~1k ppm by round 6), so the convergence
  // evidence is fully visible while the loop — which is pure per-job
  // fixed overhead at test SF, ~1.3s/round — stays bounded. At real
  // scale rounds are the cheap dimension; the bound is the contract.
  private val HitsMaxRounds = 6

  def qHitsConverge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p0 = CcPartitions
    // both join orientations materialized ONCE: each half-step then
    // zips its score-frame join exchange-free and pays only the one
    // groupBy shuffle the half-step IS (the CC loop-invariant-edges
    // discipline; a single edge copy re-exchanged every round at
    // first measurement). The by-c orientation is the shared
    // [[copurchaseEdges]] memo — built OUTSIDE the loop-AQE scope
    // (corpus-scale single-pass plan; see withLoopAqeOff).
    val edgesByC = copurchaseEdges(s, dir)
    graft.GraftSession.withLoopAqeOff(s) {
    val edgesByP = edgesByC.repartition(p0, col("p")).localCheckpoint()
    // score inits dedup ON the edge lists' existing hash(·, 8)
    // partitioning (select preserves it), so neither distinct plans
    // an exchange and the checkpoints inherit the width the loop
    // zips on (r17 — previously each init paid a 32-wide distinct
    // exchange plus the explicit 8-wide re-pin)
    var hub = edgesByC.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h"))
      .localCheckpoint()
    var auth = edgesByP.select(col("p")).distinct()
      .select(col("p"), lit(1000000L).as("a"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 0
    var done = false
    // LAGGED delta_hub (r18, guide §2.4/§1.2): the round previously
    // ran 5 actions (2 checkpoints, 2 max collects, 1 fused delta
    // collect). delta_auth needs only maxA, so it rides the maxH
    // collect; delta_hub needs maxH, so it rides the NEXT round's
    // maxA collect (both frames stay cached — the sums are map-only).
    // 4 actions per round; the exit test is unchanged because
    // delta_hub is fetched eagerly (one standalone 1-row job) exactly
    // when delta_auth == 0 — the only state in which the exit is
    // reachable — and the pending value is drained after the loop for
    // the final trace row. Same gated rows, same early-exit round.
    var dhPending: Option[(Long, DataFrame)] = None // (round, hNext w/ dh)
    var rounds0Auth = 0L // delta_auth of the round whose delta_hub is pending
    def drainDh(): Long = {
      val (_, hN) = dhPending.get
      val v = hN.agg(coalesce(sum(col("dh")), lit(0L))).collect()(0).getLong(0)
      dhPending = None
      v
    }
    while (r < HitsMaxRounds && !done) {
      r += 1
      // the previous score rides each checkpoint so the convergence
      // delta is a map-only sum over it (the fused CC changed-count
      // discipline) — no per-round compare join.
      // The round max (r13 verdict item 3): checkpoint the RAW
      // half-step aggregate (previous score attached), read the max
      // in a map-only 1-row collect over the cached blocks, and
      // apply it to the normalization as a LITERAL. No
      // single-partition WindowExec (the family's last
      // single-task stage), and no crossJoin(broadcast(agg)) — the
      // broadcast form plans the half-step subtree under BOTH join
      // sides (each round computed twice, the expensive-build-side
      // trap). The normalized score is a cheap projection over the
      // cached raw frame, so its three consumers (next half-step,
      // delta sum, next round's previous-score join) re-read cache,
      // not the plan.
      // ONE exchange per half-step (r17, guide §2.4): the width pin
      // moves BEFORE the aggregation, so the groupBy consumes
      // hash(p, 8) exchange-free and the previous-score join zips on
      // the same partitioning — previously groupBy planned its own
      // exchange (AQE-coalesced) and the pin re-exchanged the
      // aggregate (2 exchanges = 2 extra AQE stage-jobs per
      // half-step x 12 half-steps; the shuffled bytes are the same
      // ~6 MB either way at test SF — per-partition partial
      // aggregation barely shrinks this key set).
      val aRaw = edgesByC.join(hub, "c")
        .repartition(p0, col("p"))
        .groupBy(col("p")).agg(sum(col("h")).as("raw"))
        .join(auth.withColumnRenamed("a", "pa"), "p")
        .localCheckpoint()
      // collect 1: this round's maxA + (lagged) last round's delta_hub
      val m1 = aRaw.agg(max(col("raw")).as("v"))
      val c1 = dhPending match {
        case Some((pr, hN)) =>
          val rows = m1.unionAll(
            hN.agg(coalesce(sum(col("dh")), lit(0L)).as("v"))).collect()
          val dHubPrev = rows(1).getLong(0)
          rounds += ((pr, dHubPrev, rounds0Auth))
          dhPending = None
          rows(0).getLong(0)
        case None => m1.collect()(0).getLong(0)
      }
      val maxA = c1
      val aNext = aRaw.select(col("p"),
          expr(s"(cast(raw as decimal(38,0)) * 1000000) div cast($maxA as bigint)").as("a"),
          col("pa"))
        .select(col("p"), col("a"), abs(col("a") - col("pa")).as("da"))
      val hRaw = edgesByP.join(aNext.select(col("p"), col("a")), "p")
        .repartition(p0, col("c"))
        .groupBy(col("c")).agg(sum(col("a")).as("raw"))
        .join(hub.withColumnRenamed("h", "ph"), "c")
        .localCheckpoint()
      // collect 2: this round's maxH + this round's delta_auth
      // (map-only sums over the eagerly-checkpointed frames; no
      // crossJoin pairing — a 1-row broadcast per round costs more
      // KeyLock time than it saves)
      val c2 = hRaw.agg(max(col("raw")).as("v"))
        .unionAll(aNext.agg(coalesce(sum(col("da")), lit(0L)).as("v")))
        .collect()
      val (maxH, dAuth) = (c2(0).getLong(0), c2(1).getLong(0))
      val hNext = hRaw.select(col("c"),
          expr(s"(cast(raw as decimal(38,0)) * 1000000) div cast($maxH as bigint)").as("h"),
          col("ph"))
        .select(col("c"), col("h"), abs(col("h") - col("ph")).as("dh"))
      dhPending = Some((r.toLong, hNext))
      rounds0Auth = dAuth
      auth = aNext.select(col("p"), col("a"))
      hub = hNext.select(col("c"), col("h"))
      // early exit is load-bearing at scale: a graph at its fixpoint
      // at round k must not pay rounds k+1..max of corpus-scale
      // shuffles (an r10 review finding reversed the lazy-trace form
      // that did exactly that). The exit is only reachable when
      // dAuth == 0, so delta_hub is fetched eagerly just then.
      if (dAuth == 0L) {
        val dHub = drainDh()
        rounds += ((r.toLong, dHub, dAuth))
        done = dHub == 0L
      }
    }
    // drain the last round's pending delta_hub for its trace row
    if (dhPending.isDefined) {
      val pr = dhPending.get._1
      val dHub = drainDh()
      rounds += ((pr, dHub, rounds0Auth))
    }
    rounds.toSeq.toDF("round", "delta_hub", "delta_auth").orderBy(col("round"))
    } // withLoopAqeOff
  }

  val qHitsConvergeSql: String = {
    val steps = (1 to HitsMaxRounds).map { r =>
      val (hp, ap) = (s"h${r - 1}", s"a${r - 1}")
      s"""ar$r AS MATERIALIZED (SELECT p, CAST(sum(h) AS BIGINT) AS raw FROM g JOIN $hp USING (c) GROUP BY p),
         |a$r AS MATERIALIZED (SELECT p, CAST((raw::HUGEINT * 1000000) // (SELECT max(raw) FROM ar$r) AS BIGINT) AS a FROM ar$r),
         |hr$r AS MATERIALIZED (SELECT c, CAST(sum(a) AS BIGINT) AS raw FROM g JOIN a$r USING (p) GROUP BY c),
         |h$r AS MATERIALIZED (SELECT c, CAST((raw::HUGEINT * 1000000) // (SELECT max(raw) FROM hr$r) AS BIGINT) AS h FROM hr$r),
         |d$r AS (SELECT $r AS round,
         |  (SELECT CAST(sum(abs(x.h - y.h)) AS BIGINT) FROM h$r x JOIN $hp y USING (c)) AS delta_hub,
         |  (SELECT CAST(sum(abs(x.a - y.a)) AS BIGINT) FROM a$r x JOIN $ap y USING (p)) AS delta_auth)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to HitsMaxRounds).map(r => s"SELECT * FROM d$r").mkString(" UNION ALL ")
    s"""WITH g AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS MATERIALIZED (SELECT DISTINCT c, 1000000::BIGINT AS h FROM g),
       |a0 AS MATERIALIZED (SELECT DISTINCT p, 1000000::BIGINT AS a FROM g),
       |""".stripMargin + steps + s""",
alld AS ($unions),
stop AS (SELECT coalesce(min(round), $HitsMaxRounds) AS k FROM alld WHERE delta_hub = 0 AND delta_auth = 0)
SELECT CAST(round AS BIGINT) AS round, delta_hub, delta_auth FROM alld, stop WHERE round <= k ORDER BY round"""
  }

  // ---------------------------------------------------------------
  // BFS LEVEL EXPANSION — breadth-first reach from the hottest part
  // on the bipartite co-purchase graph (customers | parts offset by
  // 10⁷, the [[qPagerankConverge]] id convention): how much of the
  // graph is within k hops of the best-selling item is the
  // neighborhood-size primitive behind recommendation fan-out
  // budgets and blast-radius estimates. Seed = the max-degree part
  // (smallest id on ties — deterministic); 4 synchronous frontier
  // rounds; a node's level is its FIRST discovery (the visited
  // anti-join). Gated per level: node count, min/max id, and the id
  // sum as a DECIMAL(38,0)-backed string (no wrap horizon).
  //
  // Scale shape: the textbook distributed BFS — the undirected edge
  // list is repartitioned by src ONCE and checkpointed
  // (loop-invariant, every round's frontier join co-locates on it);
  // each frontier is repartitioned on the node key BEFORE its
  // dropDuplicates so dedup and the visited anti-join share one
  // exchange; frontier and visited are checkpointed per round so the
  // plan never grows (the [[qPagerankConverge]] loop discipline).
  // Driver traffic is 5 one-row stat reads — never a node list. The
  // oracle unrolls the same 4 rounds as MATERIALIZED chained CTEs.
  private val BfsRounds = 4

  def qBfsLevels(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p0 = CcPartitions
    val edges = copurchaseEdges(s, dir)
      .select(col("c").as("src"), (col("p") + 10000000L).as("dst"))
    graft.GraftSession.withLoopAqeOff(s) {
    val eb = edges
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(p0, col("src")).localCheckpoint()
    val seed = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node")).limit(1).select(col("node"))
      .localCheckpoint()
    def levelStats(level: Long, f: DataFrame): Row = {
      val r = f.agg(count(lit(1)).as("n"),
        coalesce(min(col("node")), lit(-1L)).as("mn"),
        coalesce(max(col("node")), lit(-1L)).as("mx"),
        coalesce(sum(col("node").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("sm")).first()
      Row(level, r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toBigInteger.toString)
    }
    val out = scala.collection.mutable.ArrayBuffer(levelStats(0L, seed))
    // visited = the chain of prior frontiers (r18): the union-and-
    // re-checkpoint frame cost one checkpoint job plus one p0-wide
    // exchange per level; anti-joining each prior frontier instead is
    // the same set subtraction over the SAME checkpointed blocks —
    // BfsRounds is a small constant, every frontier is already
    // node-partitioned (or broadcast-sized), and no per-level
    // materialization remains.
    var frontiers = List(seed)
    var frontier = seed
    var lvl = 0
    while (lvl < BfsRounds) {
      lvl += 1
      val next = frontiers.foldLeft(
          eb.join(frontier, eb("src") === frontier("node"))
            .select(col("dst").as("node"))
            .repartition(p0, col("node")).dropDuplicates("node")) {
          (acc, f) => acc.join(f.select(col("node")), Seq("node"), "left_anti")
        }
        .localCheckpoint()
      out += levelStats(lvl.toLong, next)
      frontiers ::= next
      frontier = next
    }
    val schema = StructType(Seq(
      StructField("level", LongType), StructField("n_nodes", LongType),
      StructField("min_node", LongType), StructField("max_node", LongType),
      StructField("sum_node", StringType)))
    s.createDataFrame(s.sparkContext.parallelize(out.toSeq, 1), schema)
      .orderBy(col("level"))
    } // withLoopAqeOff
  }

  val qBfsLevelsSql: String = {
    val lvls = (1 to BfsRounds).map { k =>
      val seen = (0 until k).map(j => s"SELECT node FROM l$j").mkString(" UNION ALL ")
      s"""l$k AS MATERIALIZED (SELECT DISTINCT eb.dst AS node
         |  FROM eb JOIN l${k - 1} ON eb.src = l${k - 1}.node
         |  WHERE eb.dst NOT IN ($seen))""".stripMargin
    }.mkString(",\n")
    val sel = (0 to BfsRounds).map { k =>
      s"""SELECT $k AS level, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(coalesce(min(node), -1) AS BIGINT) AS min_node,
         |  CAST(coalesce(max(node), -1) AS BIGINT) AS max_node,
         |  CAST(CAST(coalesce(sum(node), 0) AS HUGEINT) AS VARCHAR) AS sum_node
         |FROM l$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS src, l_partkey + 10000000 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |eb AS MATERIALIZED (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src AS dst FROM edges),
       |l0 AS MATERIALIZED (SELECT dst AS node FROM edges
       |  GROUP BY dst ORDER BY count(*) DESC, dst LIMIT 1),
       |$lvls
       |SELECT * FROM (
       |$sel
       |) ORDER BY level""".stripMargin
  }

  // ---------------------------------------------------------------
  // SHORTEST-PATH COUNTS (Brandes phase 1) — graph_bfs_levels walks
  // the frontier; this carries the MULTIPLICITY recursion on top of
  // it: σ(seed)=1 and σ(v) at level k is the SUM of σ over its
  // level-(k−1) parents — the path-counting half of betweenness
  // centrality, and the quantity that separates "reachable in k
  // hops" from "how much of the k-hop flow passes through v". Same
  // level-synchronous join discipline as BFS (frontier join +
  // groupBy(dst) sum + anti-join visited — integer sums, so the
  // per-level aggregation is order-independent and gates exactly);
  // σ grows multiplicatively with branching, so it rides
  // decimal(38,0)/HUGEINT end-to-end and ships as strings. The
  // backward dependency pass is deliberately NOT shipped: its δ
  // accumulations are rationals with per-node denominators σ(w) —
  // no bounded exact form to gate.
  def qPathCounts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p0 = CcPartitions
    val d38 = "decimal(38,0)"
    val edges = copurchaseEdges(s, dir)
      .select(col("c").as("src"), (col("p") + 10000000L).as("dst"))
    graft.GraftSession.withLoopAqeOff(s) {
    val eb = edges
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(p0, col("src")).localCheckpoint()
    val seed = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("node")).limit(1)
      .select(col("node"), lit(1L).cast(d38).as("sigma"))
      .localCheckpoint()
    def levelStats(level: Long, f: DataFrame): Row = {
      val r = f.agg(count(lit(1)).as("n"),
        coalesce(sum(col("sigma")), lit(0L).cast(d38)).as("sm"),
        coalesce(max(col("sigma")), lit(0L).cast(d38)).as("mx")).first()
      Row(level, r.getLong(0),
        r.getDecimal(1).toBigInteger.toString, r.getDecimal(2).toBigInteger.toString)
    }
    val out = scala.collection.mutable.ArrayBuffer(levelStats(0L, seed))
    // visited = the chain of prior frontiers (r18; the qBfsLevels
    // change): anti-join each already-checkpointed level instead of
    // maintaining a union-and-re-checkpoint frame — one checkpoint
    // job and one p0-wide exchange saved per level
    var frontiers = List(seed)
    var frontier = seed
    var lvl = 0
    while (lvl < BfsRounds) {
      lvl += 1
      val next = frontiers.foldLeft(
          eb.join(frontier, eb("src") === frontier("node"))
            .select(col("dst").as("node"), col("sigma"))
            .repartition(p0, col("node"))
            .groupBy(col("node")).agg(sum(col("sigma")).cast(d38).as("sigma"))) {
          (acc, f) => acc.join(f.select(col("node")), Seq("node"), "left_anti")
        }
        .localCheckpoint()
      out += levelStats(lvl.toLong, next)
      frontiers ::= next
      frontier = next
    }
    val schema = StructType(Seq(
      StructField("level", LongType), StructField("n_nodes", LongType),
      StructField("sum_sigma", StringType), StructField("max_sigma", StringType)))
    s.createDataFrame(s.sparkContext.parallelize(out.toSeq, 1), schema)
      .orderBy(col("level"))
    } // withLoopAqeOff
  }

  val qPathCountsSql: String = {
    val lvls = (1 to BfsRounds).map { k =>
      val seen = (0 until k).map(j => s"SELECT node FROM l$j").mkString(" UNION ALL ")
      s"""l$k AS MATERIALIZED (SELECT eb.dst AS node, sum(l${k - 1}.sigma) AS sigma
         |  FROM eb JOIN l${k - 1} ON eb.src = l${k - 1}.node
         |  WHERE eb.dst NOT IN ($seen) GROUP BY eb.dst)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to BfsRounds).map { k =>
      s"""SELECT $k AS level, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(CAST(coalesce(sum(sigma), 0) AS HUGEINT) AS VARCHAR) AS sum_sigma,
         |  CAST(CAST(coalesce(max(sigma), 0) AS HUGEINT) AS VARCHAR) AS max_sigma
         |FROM l$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS src, l_partkey + 10000000 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |eb AS MATERIALIZED (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src AS dst FROM edges),
       |l0 AS MATERIALIZED (SELECT dst AS node, 1::HUGEINT AS sigma FROM edges
       |  GROUP BY dst ORDER BY count(*) DESC, dst LIMIT 1),
       |$lvls
       |SELECT * FROM (
       |$sel
       |) ORDER BY level""".stripMargin
  }

  // ---------------------------------------------------------------
  // PARAGRAPH-GRANULAR EXACT DEDUP (C4-style): the first
  // normalization step of real corpus pipelines — dedup INTRA-doc
  // units corpus-wide, not whole documents. The corpus has no
  // newline structure, so the deterministic paragraph unit is the
  // 3-word tile (words i·3..i·3+2 of the `\s+` split; the last tile
  // may be short) — the same fixed-unit shape C4 applies to its
  // three-sentence spans. A tile survives iff its (doc_id, idx) is
  // the GLOBAL first occurrence of its md5-60bit hash, ordered by
  // (doc_id, idx) — the deterministic first-writer-wins rule. Each
  // doc gates its retained-tile BITMASK as an integer — CLIPPED to
  // tiles idx < 62 on BOTH engines (Spark's shiftleft wraps the
  // shift amount mod 64 while DuckDB's << does not, so an unclipped
  // mask would diverge cross-engine the first time a ≥64-tile doc
  // appears; ≥190 words at ParaTile=3 — real corpora have them even
  // though this one tops out at 34 tiles). The count/chars columns
  // stay mask-free over ALL tiles; a production pipeline ships the
  // full mask as bytes. Boundary-tested at 65 tiles in AnalyticsSpec.
  // Scale shape: one mapPartitions tiling kernel over the
  // repartitioned corpus (fixed-width rows out: doc_id, idx, hash,
  // len — never tile text), one hash-partitioned window for
  // first-occurrence ranking, one groupBy(doc_id) fold. All shuffles
  // carry 32-byte rows; no all-pairs anywhere; survives 1000
  // executors by construction. Ref analogue: the reference's
  // per-field normalize is the single-column form of intra-record
  // unit cleanup (normalization.ts:103-114).
  private val ParaTile = 3

  def qParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("idx", LongType),
      StructField("th", LongType),
      StructField("tlen", LongType)))
    val tile = ParaTile
    val tiles = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val id = r.getLong(0)
          val w = Text.duckWords(r.getString(1))
          val n = (w.length + tile - 1) / tile
          (0 until n).iterator.map { gi =>
            val t = w.slice(gi * tile, gi * tile + tile).mkString(" ")
            // md5Mod with p = Long.MaxValue is the plain 60-bit
            // ('0x'||substr(md5(t),1,15))::BIGINT — no reduction
            Row(id, gi.toLong, md5Mod(md, t, Long.MaxValue), t.length.toLong)
          }
        }
      }(Encoders.row(schema))
    val wFirst = Window.partitionBy(col("th")).orderBy(col("doc_id"), col("idx"))
    tiles
      .withColumn("kept", (row_number().over(wFirst) === 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(col("kept")).as("n_kept"),
        sum(expr("CASE WHEN kept = 1 AND idx < 62 THEN shiftleft(CAST(1 AS BIGINT), CAST(idx AS INT)) ELSE CAST(0 AS BIGINT) END")).as("kept_mask"),
        sum(when(col("kept") === 1L, col("tlen")).otherwise(lit(0L))).as("kept_chars"))
      .orderBy(col("doc_id"))
  }

  val qParagraphDedupSql: String =
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |tiles AS (
       |  SELECT doc_id, CAST(gi AS BIGINT) AS idx,
       |    array_to_string(w[gi*$ParaTile+1 : gi*$ParaTile+$ParaTile], ' ') AS tile
       |  FROM ws, UNNEST(range((len(w)+${ParaTile - 1})//$ParaTile)) AS t(gi)),
       |ranked AS (
       |  SELECT doc_id, idx, length(tile) AS tlen,
       |    row_number() OVER (PARTITION BY ('0x' || substr(md5(tile),1,15))::BIGINT
       |                       ORDER BY doc_id, idx) = 1 AS kept
       |  FROM tiles)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN kept AND idx < 62 THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS kept_mask,
       |  CAST(sum(CASE WHEN kept THEN tlen ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // CROSS-SHARD BLOOM PREFILTER — the handshake a sharded 100 TB
  // dedup actually runs before any shuffle-heavy join: each shard
  // summarizes its distinct tile hashes into a FIXED-SIZE Bloom
  // filter (m = 2^15 bits, k = 3 positions via the (1+2j)h+(17+j)
  // mod-p mix of the 60-bit md5), shards exchange only the filters
  // (here: broadcast bit-position sets — m bits per shard regardless
  // of corpus size, the whole point), and a shard probes every OTHER
  // shard's filter to clip its candidate set before the exact
  // cross-shard join. The gate emits, per ordered shard pair, the
  // probe count, bloom hit count, EXACT intersection (ground truth),
  // and the false-positive count — bloom hits minus truth, a fully
  // deterministic integer because every position derives from md5.
  // Sharding uses the md5-bucket convention (doc_id modulo splits
  // collapse — the r13 lesson). No false NEGATIVES are possible by
  // construction: the gate's n_missed column must be identically 0.
  private val BloomM = 32768L
  private val BloomK = 3

  /** Distinct (shard, tile-hash) pairs: the paragraph tiling kernel
    * re-keyed by the doc's md5 shard. */
  private def shardTileHashes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("shard", LongType), StructField("th", LongType)))
    val tile = ParaTile
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val id = r.getLong(0)
          val sh = md5Mod(md, "shard_" + id, Long.MaxValue) % 4L
          val w = Text.duckWords(r.getString(1))
          val n = (w.length + tile - 1) / tile
          (0 until n).iterator.map { gi =>
            Row(sh, md5Mod(md, w.slice(gi * tile, gi * tile + tile).mkString(" "),
              Long.MaxValue))
          }
        }
      }(Encoders.row(schema))
      .distinct()
  }

  def qBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val p = MersenneP
    val ht = shardTileHashes(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("th"))
      .localCheckpoint() // probes, truth, and bits all read it
    // per-shard bloom BIT SETS: k positions per hash, distinct — the
    // fixed-size summary each shard publishes (≤ m rows per shard)
    val js = (0 until BloomK).map(lit(_))
    val bits = ht.select(col("shard"), col("th"), explode(array(js: _*)).as("j"))
      .withColumn("pos",
        expr(s"((1 + 2 * j) * (th % $p) + (17 + j)) % $p % $BloomM"))
      .select(col("shard").as("shard_b"), col("pos")).distinct()
      .localCheckpoint()
    val bitCounts = bits.groupBy(col("shard_b"))
      .agg(count(lit(1)).as("bits_set_b"))
    // probe side: shard A's hashes against every other shard's filter
    // — k position rows per (hash, target shard), membership = all k
    // positions present (count == k after the broadcast bit join)
    val probes = ht.select(col("shard").as("shard_a"), col("th"))
    val shardIds = bitCounts.select(col("shard_b"))
    val probeRows = probes.join(broadcast(shardIds), col("shard_a") =!= col("shard_b"))
      .select(col("shard_a"), col("shard_b"), col("th"),
        explode(array(js: _*)).as("j"))
      .withColumn("pos",
        expr(s"((1 + 2 * j) * (th % $p) + (17 + j)) % $p % $BloomM"))
    val hits = probeRows
      .join(broadcast(bits), Seq("shard_b", "pos"))
      .groupBy(col("shard_a"), col("shard_b"), col("th"))
      .agg(count(lit(1)).as("k_present"))
      .filter(col("k_present") === BloomK)
      .groupBy(col("shard_a"), col("shard_b"))
      .agg(count(lit(1)).as("n_bloom_hits"))
    // exact ground truth: hash present in BOTH shards (one
    // hash-partitioned self-join on the checkpointed distinct frame)
    val truth = ht.select(col("shard").as("shard_a"), col("th"))
      .join(ht.select(col("shard").as("shard_b"), col("th")), Seq("th"))
      .filter(col("shard_a") =!= col("shard_b"))
      .groupBy(col("shard_a"), col("shard_b"))
      .agg(count(lit(1)).as("n_true"))
    val nProbes = probes.groupBy(col("shard_a"))
      .agg(count(lit(1)).as("n_probes"))
    hits
      .join(truth, Seq("shard_a", "shard_b"), "left")
      .na.fill(0L, Seq("n_true"))
      .join(broadcast(nProbes), Seq("shard_a"))
      .join(broadcast(bitCounts), Seq("shard_b"))
      .select(col("shard_a"), col("shard_b"), col("n_probes"),
        col("n_bloom_hits"), col("n_true"),
        (col("n_bloom_hits") - col("n_true")).as("n_false_pos"),
        lit(0L).as("n_missed"), col("bits_set_b"))
      .orderBy(col("shard_a"), col("shard_b"))
  }

  val qBloomPrefilterSql: String =
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |tiles AS (
       |  SELECT ('0x' || substr(md5('shard_' || doc_id), 1, 15))::BIGINT % 4 AS shard,
       |    ('0x' || substr(md5(array_to_string(w[gi*$ParaTile+1 : gi*$ParaTile+$ParaTile], ' ')), 1, 15))::BIGINT AS th
       |  FROM ws, UNNEST(range((len(w)+${ParaTile - 1})//$ParaTile)) AS t(gi)),
       |ht AS MATERIALIZED (SELECT DISTINCT shard, th FROM tiles),
       |bits AS MATERIALIZED (SELECT DISTINCT shard AS shard_b,
       |    ((1 + 2 * j) * (th % $MersenneP) + (17 + j)) % $MersenneP % $BloomM AS pos
       |  FROM ht, UNNEST([0, 1, 2]) AS u(j)),
       |bc AS (SELECT shard_b, CAST(count(*) AS BIGINT) AS bits_set_b FROM bits GROUP BY 1),
       |pr AS (SELECT a.shard AS shard_a, b.shard_b, a.th,
       |    ((1 + 2 * j) * (a.th % $MersenneP) + (17 + j)) % $MersenneP % $BloomM AS pos, j
       |  FROM ht a, bc b, UNNEST([0, 1, 2]) AS u(j) WHERE a.shard <> b.shard_b),
       |hits AS (SELECT shard_a, shard_b, th FROM pr JOIN bits USING (shard_b, pos)
       |  GROUP BY 1, 2, 3 HAVING count(*) = $BloomK),
       |h AS (SELECT shard_a, shard_b, CAST(count(*) AS BIGINT) AS n_bloom_hits
       |  FROM hits GROUP BY 1, 2),
       |tr AS (SELECT a.shard AS shard_a, b.shard AS shard_b, CAST(count(*) AS BIGINT) AS n_true
       |  FROM ht a JOIN ht b ON a.th = b.th AND a.shard <> b.shard GROUP BY 1, 2),
       |np AS (SELECT shard AS shard_a, CAST(count(*) AS BIGINT) AS n_probes FROM ht GROUP BY 1)
       |SELECT h.shard_a, h.shard_b, np.n_probes, h.n_bloom_hits,
       |  CAST(coalesce(tr.n_true, 0) AS BIGINT) AS n_true,
       |  CAST(h.n_bloom_hits - coalesce(tr.n_true, 0) AS BIGINT) AS n_false_pos,
       |  CAST(0 AS BIGINT) AS n_missed, bc.bits_set_b
       |FROM h LEFT JOIN tr ON h.shard_a = tr.shard_a AND h.shard_b = tr.shard_b
       |JOIN np ON h.shard_a = np.shard_a
       |JOIN bc ON h.shard_b = bc.shard_b
       |ORDER BY h.shard_a, h.shard_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_paragraph" -> (qParagraphDedup _),
    "dedup_bloom_prefilter" -> (qBloomPrefilter _),
    "graph_path_counts" -> (qPathCounts _),
    "graph_bfs_levels" -> (qBfsLevels _),
    "graph_hits" -> (qHits _),
    "graph_hits_converge" -> (qHitsConverge _),
    "graph_common_neighbors" -> (qCommonNeighbors _),
    "graph_link_predict" -> (qLinkPredict _),
    "graph_degree_assort" -> (qDegreeAssort _),
    "dedup_source_matrix" -> (qSourceMatrix _),
    "graph_source_modularity" -> (qSourceModularity _),
    "graph_louvain_step" -> (qLouvainStep _),
    "dedup_ensemble" -> (qDedupEnsemble _),
    "dedup_cap_recall" -> (qCapRecall _),
    "dedup_fuzzy_names" -> (qFuzzyNames _),
    "dedup_clusters" -> (qClusters _),
    "graph_pagerank_step" -> (qPagerankStep _),
    "graph_pagerank_converge" -> (qPagerankConverge _),
    "graph_triangles" -> (qTriangles _),
    "graph_label_prop" -> (qLabelProp _),
    "dedup_canonical" -> (qCanonical _),
    "dedup_canonical_quality" -> (qCanonicalQuality _),
    "dedup_shard_local" -> (qShardLocal _),
    "graph_degree_dist" -> (qDegreeDist _),
    "graph_kcore" -> (qKcore _),
    "dedup_cluster_purity" -> (qClusterPurity _),
    "dedup_ngram_jaccard" -> (qNgramJaccard _),
    "dedup_exact" -> (qExact _),
    "dedup_minhash_lsh" -> (qMinHashLsh _),
    "dedup_minhash_capped" -> (qMinHashCapped _),
    "dedup_winnow_pairs" -> (qWinnowPairs _),
    "dedup_incremental" -> (qIncremental _),
    "dedup_simhash" -> (qSimHash _),
    "dedup_simhash_pairs" -> (qSimHashPairs _),
    "dedup_embed_cosine" -> (qEmbedCosine _),
    "dedup_semantic_clusters" -> (qSemanticClusters _),
    "dedup_substring" -> (qSubstring _),
    "dedup_containment" -> (qContainment _),
    "dedup_threshold_sweep" -> (qThresholdSweep _),
    "dedup_minhash_est" -> (qMinhashEst _),
    "dedup_minhash_bbit" -> (qMinhashBbit _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_paragraph" -> qParagraphDedupSql,
    "dedup_bloom_prefilter" -> qBloomPrefilterSql,
    "graph_bfs_levels" -> qBfsLevelsSql,
    "graph_path_counts" -> qPathCountsSql,
    "graph_hits" -> qHitsSql,
    "graph_common_neighbors" -> qCommonNeighborsSql,
    "graph_link_predict" -> qLinkPredictSql,
    "graph_degree_assort" -> qDegreeAssortSql,
    "dedup_source_matrix" -> qSourceMatrixSql,
    "graph_source_modularity" -> qSourceModularitySql,
    "graph_louvain_step" -> qLouvainStepSql,
    "graph_hits_converge" -> qHitsConvergeSql,
    "dedup_ensemble" -> qDedupEnsembleSql,
    "dedup_cap_recall" -> qCapRecallSql,
    "dedup_fuzzy_names" -> qFuzzyNamesSql,
    "dedup_clusters" -> qClustersSql,
    "graph_pagerank_step" -> qPagerankStepSql,
    "graph_pagerank_converge" -> qPagerankConvergeSql,
    "graph_triangles" -> qTrianglesSql,
    "graph_label_prop" -> qLabelPropSql,
    "dedup_canonical" -> qCanonicalSql,
    "dedup_canonical_quality" -> qCanonicalQualitySql,
    "dedup_shard_local" -> qShardLocalSql,
    "graph_degree_dist" -> qDegreeDistSql,
    "graph_kcore" -> qKcoreSql,
    "dedup_cluster_purity" -> qClusterPuritySql,
    "dedup_ngram_jaccard" -> qNgramJaccardSql,
    "dedup_exact" -> qExactSql,
    "dedup_minhash_lsh" -> qMinHashLshSql,
    "dedup_minhash_capped" -> qMinHashCappedSql,
    "dedup_winnow_pairs" -> qWinnowPairsSql,
    "dedup_incremental" -> qIncrementalSql,
    "dedup_simhash" -> qSimHashSql,
    "dedup_simhash_pairs" -> qSimHashPairsSql,
    "dedup_embed_cosine" -> qEmbedCosineSql,
    "dedup_semantic_clusters" -> qSemanticClustersSql,
    "dedup_substring" -> qSubstringSql,
    "dedup_containment" -> qContainmentSql,
    "dedup_threshold_sweep" -> qThresholdSweepSql,
    "dedup_minhash_est" -> qMinhashEstSql,
    "dedup_minhash_bbit" -> qMinhashBbitSql,
  )
}
