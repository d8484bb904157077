package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the from-scratch sketches, the exact
  * model fits, and the fusion/filter ensembles — the properties that
  * hold at ANY corpus shape, complementing the oracle gate's exact
  * value equality at the test SFs. */
class SketchesSpec extends SparkSpec {

  test("KMV: estimate positive, exact path when |S| < k, err_pm self-consistent") {
    val r = Sketches.qKmvDistinct(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val (k, kth, nExact, est, errPm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(k == 64 && kth > 0 && est > 0)
    if (nExact < k) assert(est == nExact, "under k distinct values KMV is exact")
    else assert(est == 63L * 281474976710656L / kth)
    assert(errPm == math.abs(est - nExact) * 1000 / math.max(nExact, 1L))
  }

  test("HLL: 64 registers in range; estimate row derives from the registers") {
    val regs = Sketches.qHllRegisters(spark, sfDir).collect()
    assert(regs.length == 64)
    assert(regs.map(_.getLong(0)).toSeq == (0L until 64L))
    assert(regs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 43))
    val est = Sketches.qHllEstimate(spark, sfDir).collect().head
    val denom = regs.map(r => 1L << (30 - math.min(r.getLong(1), 30L)).toInt).sum
    val vZero = regs.count(_.getLong(1) == 0)
    assert(est.getLong(1) == vZero, "v_zero")
    assert(est.getLong(2) == denom, "denom_scaled")
    assert(est.getLong(3) == 2904064L * 1073741824L / (1000L * denom), "hll_est")
    val linear = if (vZero > 0 && est.getLong(3) <= 160) 1L else 0L
    assert(est.getLong(6) == linear, "linear_regime flag")
  }

  test("CMS never undercounts and ranks the true heavy hitters") {
    val r = Sketches.qCmsHeavy(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 10)
    assert(r.forall(x => x.getLong(2) >= x.getLong(1)), "cms_est >= true_cnt")
    assert(r.forall(x => x.getLong(3) == x.getLong(2) - x.getLong(1)))
    val cnts = r.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "true_cnt descending")
  }

  test("per-source OLS moments match a driver-side exact recomputation") {
    val fits = Models.qLinregSources(spark, sfDir).collect()
    assert(fits.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("text"), col("n_chars")).collect()
    val src = fits.head.getString(0)
    val xs = docs.filter(_.getString(0) == src)
      .map(d => (Text.duckWords(d.getString(1)).length.toLong, d.getLong(2)))
    val n = xs.length.toLong
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(t => t._1 * t._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum
    val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
    assert(fits.head.getLong(1) == n)
    assert(fits.head.getString(2).toLong == num, "slope numerator")
    assert(fits.head.getString(3).toLong == den, "slope denominator")
    val slope = if (num >= 0) 1000 * num / math.max(den, 1L)
                else -(1000 * -num / math.max(den, 1L))
    assert(fits.head.getLong(4) == slope)
  }

  test("NB trainer: ranks are 1..10 per class, smoothing self-consistent") {
    val m = Models.qNbTrain(spark, sfDir).collect()
    val byLang = m.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to rows.length))
      val cs = rows.sortBy(_.getInt(2)).map(_.getLong(4))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cnt desc by rank")
    }
    // recompute one conditional: ppm = (cnt+1)*1e6 / (tokens_lang + |V|)
    val t = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(lower(trim(col("text"))), "[ \t\n\f\r]+")).as("w"))
    val lang0 = m.head.getString(0)
    val tokens = t.filter(col("lang") === lang0).count()
    val vocab = t.select(col("w")).distinct().count()
    assert(m.head.getLong(5) == (m.head.getLong(4) + 1) * 1000000L / (tokens + vocab))
  }

  test("filter decisions: keep iff mask 0; masks within the 4 defined bits") {
    val r = Pipeline.qFilterDecisions(spark, sfDir).collect()
    assert(r.length == graft.Tables.documents(spark, sfDir).count())
    assert(r.forall(x => x.getLong(4) >= 0 && x.getLong(4) <= 15))
    assert(r.forall(x => (x.getLong(5) == 1L) == (x.getLong(4) == 0L)))
    // recompute one doc's mask from its raw text
    val d0 = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).first()
    val ws = Text.duckWords(d0.getString(1))
    val nw = ws.length.toLong
    val awl = ws.map(_.length.toLong).sum * 1000 / math.max(nw, 1L)
    val mf = ws.groupBy(identity).values.map(_.length).max.toLong * 1000 / math.max(nw, 1L)
    val row = r.find(_.getLong(0) == d0.getLong(0)).get
    assert(row.getLong(1) == nw && row.getLong(2) == awl && row.getLong(3) == mf)
  }

  test("BPE holdout: splits partition the corpus, compression consistent") {
    val r = Text.queries("text_bpe_holdout")(spark, sfDir).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("1_train", "2_holdout"))
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(r.map(_.getLong(1)).sum == n, "splits partition the corpus")
    r.foreach { row =>
      val (nb, na, ppm) = (row.getLong(2), row.getLong(3), row.getLong(4))
      assert(na <= nb, "merges can only shrink the symbol count")
      assert(ppm == (nb - na) * 1000000L / nb)
    }
  }

  test("bloom filter: occupancy bounded, no false negatives possible by construction") {
    val r = Sketches.qBloomFpr(spark, sfDir).collect().head
    val (m, k, nIns, nBits, nProbes, nFp, fprPm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
    assert(m == 65536L && k == 3L)
    assert(nBits <= math.min(m, k * nIns), "occupied bits bounded by k*n and m")
    assert(nBits >= (k * nIns + m - 1) / m, "at least one bit per ceil(kn/m) collisions")
    assert(nFp >= 0 && nFp <= nProbes)
    assert(fprPm == nFp * 1000 / math.max(nProbes, 1L))
  }

  test("audio windows tile every payload body with the fixed hop") {
    val w = Multimodal.qAudioWindows(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(encode(col("text"), "utf-8")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = w.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2 > 0).keySet)
    byDoc.foreach { case (id, rows) =>
      val n = docs(id)
      assert(rows.length == ((n + 127) / 128).toInt, s"window count for doc $id")
      assert(rows.map(_.getLong(1)).toSeq.sorted == (0L until rows.length))
      // every full-coverage invariant: bytes covered once at hop level
      rows.foreach { r =>
        assert(r.getLong(2) >= 1 && r.getLong(2) <= 256)
        assert(r.getLong(4) <= 255 && r.getLong(3) <= 255L * r.getLong(2))
      }
    }
  }

  test("silence trim spans re-derive from the window frame and respect window geometry") {
    val t = Multimodal.qSilenceTrim(spark, sfDir).collect()
    val w = Multimodal.qAudioWindows(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(t.map(_.getLong(0)).toSet == w.keySet, "one trim row per windowed doc")
    t.foreach { r =>
      val (id, nw, vw, fk, lk, ts, te, tot, kept, pm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
      val rows = w(id)
      assert(nw == rows.length.toLong)
      val voiced = rows.filter(x => x.getLong(3) > 94L * x.getLong(2)).map(_.getLong(1))
      assert(vw == voiced.length.toLong, s"voiced count for doc $id")
      if (voiced.isEmpty) {
        assert(fk == -1L && lk == -1L && ts == 0L && te == 0L && kept == 0L && pm == 1000L)
      } else {
        assert(fk == voiced.min && lk == voiced.max)
        assert(ts == fk * 128L, "trim starts at the first voiced window's lo")
        val lastRow = rows.find(_.getLong(1) == lk).get
        assert(te == lk * 128L + lastRow.getLong(2), "trim ends at the last voiced window's hi")
        assert(kept == te - ts && kept >= 1 && te <= tot)
        assert(pm == 1000L * (tot - kept) / tot)
      }
    }
    // the threshold must actually trim something and keep something
    assert(t.exists(_.getLong(9) == 0L) && t.exists(r => r.getLong(9) > 0L && r.getLong(9) < 1000L))
  }

  test("label propagation: members partition the touched nodes, internal <= edges") {
    val lp = Dedup.qLabelProp(spark, sfDir).collect()
    val pairs = Dedup.qMinHashLsh(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
    val nodes = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    assert(lp.map(_.getLong(1)).sum == nodes.length.toLong,
      "community sizes partition the edge-touched node set")
    assert(lp.map(_.getLong(2)).sum <= pairs.length.toLong,
      "internal edges cannot exceed the pair list")
    assert(lp.forall(r => r.getLong(1) >= 1 && r.getLong(2) >= 0))
  }

  test("knn graph edges carry brute-force-identical cosines, ranked per vector") {
    val g = Similarity.qKnnGraph(spark, sfDir).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).toSeq.sorted == (1 to rs.length), "dense ranks")
      assert(rs.map(_.getLong(2)).distinct.length == rs.length, "distinct neighbors")
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cosine desc by rank")
    }
    // spot-check one edge's cosine against a driver-side dot product
    val ids = Set(g.head.getLong(0), g.head.getLong(2))
    val vs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids.toSeq: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val (a, b) = (vs(g.head.getLong(0)), vs(g.head.getLong(2)))
    def dot(x: Array[Double], y: Array[Double]) =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
    val cos = BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(g.head.getDouble(3) - cos) < 1e-9)
  }

  test("novelty attributes every distinct shingle exactly once") {
    val nov = Sketches.qNoveltySources(spark, sfDir).collect()
    // Σ n_novel over sources must equal the corpus-wide distinct
    // shingle count — the same 48-bit hash domain KMV gates exactly
    val nExact = Sketches.qKmvDistinct(spark, sfDir).collect().head.getLong(2)
    assert(nov.map(_.getLong(3)).sum == nExact, "first occurrences partition the shingle set")
    assert(nov.forall(r => r.getLong(3) <= r.getLong(2)), "novel <= total per source")
    assert(nov.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 1000))
  }

  test("interval join equals a brute-force theta join; zero sessions kept") {
    import graft.Tables
    val out = Temporal.qIntervalJoin(spark, sfDir).collect()
    val sessions = Temporal.qSessionize(spark, sfDir).count()
    assert(out.length == sessions, "every session appears, incl. zero-concurrency ones")
    // brute-force recount for the densest session via a raw theta join
    val top = out.maxBy(_.getLong(3))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc")).collect()
    val sameUser = ev.filter(_.getLong(0) == top.getLong(0)).map(_.getLong(1)).sorted
    // reconstruct that user's session bounds: split at >30 min gaps
    val gaps = sameUser.zip(sameUser.tail)
    var bounds = List((sameUser.head, sameUser.head))
    gaps.foreach { case (a, b) =>
      if (b - a > 1800000000L) bounds = (b, b) :: bounds
      else bounds = (bounds.head._1, b) :: bounds.tail
    }
    val (lo, hi) = bounds.reverse(top.getLong(1).toInt - 1)
    val brute = ev.filter(r => r.getLong(0) != top.getLong(0)
      && r.getLong(1) >= lo && r.getLong(1) <= hi)
    assert(top.getLong(3) == brute.length.toLong, "n_concurrent")
    assert(top.getLong(4) == brute.map(_.getLong(2)).sum, "cents_concurrent")
  }

  test("quantile sketch: estimates interpolate inside the hit bin and the exact ranks are true") {
    val r = Sketches.qQuantileSketch(spark, sfDir).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(500L, 950L, 990L))
    val cents = graft.Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted
    r.foreach { row =>
      val (qPm, rank, nTotal, bin, est, exact, errPpm) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(4),
          row.getLong(5), row.getLong(6), row.getLong(7))
      assert(nTotal == cents.length.toLong)
      assert(rank == (qPm * nTotal + 999) / 1000)
      assert(exact == cents(rank.toInt - 1), "exact order statistic")
      assert(est >= bin * 100000L && est <= (bin + 1) * 100000L,
        "estimate interpolates inside its bin")
      assert(exact >= bin * 100000L && exact < (bin + 1) * 100000L,
        "the true quantile lies in the hit bin")
      assert(errPpm == math.abs(est - exact) * 1000000L / math.max(exact, 1L))
    }
  }

  test("quantile sketch: no unpartitioned window consumes the corpus-derived exact tier") {
    // r14 verdict finding 1: the exact-comparison pass is clipped to
    // the histogram's hit bins, so its cumulative window partitions by
    // bin (≤ QBinW distinct cent values per partition at ANY corpus
    // size). The only global windows left must walk checkpointed
    // metadata frames (the ~105-row bins walk → LogicalRDD leaves),
    // never a corpus file scan.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = Sketches.qQuantileSketch(spark, sfDir).queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window nodes in the quantile plan")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val scansCorpus = w.child.collectLeaves().exists(_.isInstanceOf[LogicalRelation])
      assert(!scansCorpus,
        "unpartitioned window over a corpus file scan:\n" + w.treeString)
    }
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "the clipped exact tier should plan a bin-partitioned window")
  }

  test("epoch plan conserves the token budget under the cap and redistribution") {
    val r = Pipeline.qEpochPlan(spark, sfDir).collect()
    assert(r.nonEmpty)
    val corpusToks = r.map(_.getLong(2)).sum
    val sumTarget = r.map(_.getLong(4)).sum
    // per-source truncating division: the plan can undershoot the
    // budget by at most one token per source, never overshoot
    assert(sumTarget <= 3 * corpusToks && sumTarget > 3 * corpusToks - r.length)
    r.foreach { row =>
      val (toks, target, fin, epochsPm, capped, overflow) =
        (row.getLong(2), row.getLong(4), row.getLong(5), row.getLong(6),
          row.getLong(7), row.getLong(8))
      if (capped == 1L) assert(fin == 3 * toks, "capped source pinned to the epoch cap")
      else assert(fin >= target, "open sources only gain from redistribution")
      assert(epochsPm == fin * 1000 / toks)
      assert(overflow == (if (capped == 0L && fin > 3 * toks) 1L else 0L))
    }
    assert(r.map(_.getLong(5)).sum <= sumTarget + r.length,
      "redistribution hands out at most the shortfall (plus per-source truncation)")
  }

  test("KMV algebra: estimates derive from the merged sketch and inclusion-exclusion holds") {
    val r = Sketches.qKmvAlgebra(spark, sfDir).collect().head
    val (k, nA, nB, uEst, uExact, _, kCommon, iEst, iExact, _) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
    assert(k == 64 && kCommon >= 0 && kCommon <= k)
    assert(uExact == nA + nB - iExact, "exact counts obey inclusion-exclusion")
    assert(iEst == kCommon * uEst / k, "intersection estimate is rho * union estimate")
    assert(uEst > 0 && uEst >= iEst, "union estimate dominates the intersection estimate")
    assert(r.getLong(5) == (if (uEst >= uExact) (uEst - uExact) * 1000 / math.max(uExact, 1)
      else -((uExact - uEst) * 1000 / math.max(uExact, 1))), "signed union error")
  }

  test("rank fusion: Borda scores decompose into the two source ranks") {
    val a = Similarity.qTopkCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val b = Similarity.qPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val fused = Similarity.qRankFusion(spark, sfDir).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expected = a.get(key).map(6 - _).getOrElse(0) + b.get(key).map(6 - _).getOrElse(0)
      assert(r.getLong(3) == expected.toLong, s"borda for $key")
      assert(r.getLong(4) == (if (a.contains(key) && b.contains(key)) 1L else 0L))
    }
    val ranks = fused.groupBy(_.getLong(0))
    ranks.values.foreach(rs => assert(rs.map(_.getInt(1)).toSeq.sorted == (1 to rs.length)))
  }
}
