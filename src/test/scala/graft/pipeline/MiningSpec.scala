package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Closed-form checks for the reference-classifier and bitext-mining
  * operators: NB weights hand-computed on a 3-doc corpus, the margin
  * criterion replayed against in-test brute force on the fixture.
  */
class MiningSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark
  private lazy val emb = s.read.parquet(s"$sf/embeddings.parquet")

  test("NB classifier: hand-computed smoothed log-odds, bare-prior " +
      "fallback for out-of-vocabulary docs") {
    import s.implicits._
    val docs = Seq(
      (1L, "a a b", "ref"),
      (2L, "c c b", "web"),
      (3L, "zzz", "web")
    ).toDF("doc_id", "text", "src")
    val out = TextAnalysis.nbClassifier(docs, col("src") === "ref")
      .orderBy("doc_id").collect()
    // counts: a=(2,0) b=(1,1) c=(0,2) zzz=(0,1); n_pos=3, n_neg=4, v=4
    // wt(w) = ln((c_pos+1)/(3+4)) - ln((c_neg+1)/(4+4))
    // prior = ln((1+1)/(2+1)) = ln(2/3)
    val prior = math.log(2.0 / 3)
    val wtA = math.log(3.0 / 7) - math.log(1.0 / 8)
    val wtB = math.log(2.0 / 7) - math.log(2.0 / 8)
    val wtZ = math.log(1.0 / 7) - math.log(2.0 / 8)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r1 = out(0)
    assert(r1.getDouble(1) == r6(2 * wtA + wtB + prior))
    assert(r1.getBoolean(2), "doc 1 is reference-vocabulary heavy")
    assert(r1.getLong(3) == 3)
    // doc 3's lone token is trained as a negative-class word
    val r3 = out(2)
    assert(r3.getDouble(1) == r6(wtZ + prior))
    assert(!r3.getBoolean(2))
    assert(r3.getLong(3) == 1)
  }

  test("NB classifier: vocabulary cap keeps top-by-(count, word) — " +
      "deterministic tie-break") {
    import s.implicits._
    val docs = Seq(
      (1L, "a a b", "ref"),
      (2L, "c c b", "web"),
      (3L, "zzz", "web")
    ).toDF("doc_id", "text", "src")
    // all of a/b/c tie at count 2 (zzz at 1) — cap 1 must keep 'a'
    // (word asc breaks the tie), so doc 2's tokens all fall out of
    // vocabulary and it scores the bare prior.
    val out = TextAnalysis.nbClassifier(docs, col("src") === "ref",
        vocabCap = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 2, "doc 1 keeps its two 'a' tokens")
    assert(out(1).getLong(3) == 0, "doc 2 fully out-of-vocabulary")
    // a fully-OOV doc scores the bare class prior
    assert(out(1).getDouble(1) ==
      BigDecimal(math.log(2.0 / 3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("bitext mining equals brute-force margin criterion on the " +
      "fixture slice") {
    // In-test ground truth: all-pairs cosines over the same slice,
    // dataframe-side (no kernel), replaying the full criterion.
    val lim = 300L
    val v = emb.filter(col("vec_id") < lim)
    val mined = Similarity.bitextMine(v,
      srcFilter = col("vec_id") % 2 === 0,
      tgtFilter = col("vec_id") % 2 === 1)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))

    def side(parity: Int, id: String, vc: String) =
      v.filter(col("vec_id") % 2 === parity)
        .select(col("vec_id").as(id),
          col("embedding").cast("array<double>").as(vc))
    val cos = (a: String, b: String) => {
      val dot = aggregate(zip_with(col(a), col(b), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      val n = (c: String) => sqrt(aggregate(col(c), lit(0.0d),
        (acc, x) => acc + x * x))
      dot / (n(a) * n(b))
    }
    val pairs = side(0, "sid", "sv").crossJoin(side(1, "tid", "tv"))
      .select(col("sid"), col("tid"), cos("sv", "tv").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySrc = pairs.groupBy(_._1)
    val byTgt = pairs.groupBy(_._2)
    def topK[A](xs: Array[(Long, Long, Double)], other: ((Long, Long, Double)) => Long, k: Int) =
      xs.sortBy(t => (-t._3, other(t))).take(k)
    val degS = bySrc.map { case (sid, xs) =>
      sid -> topK(xs, _._2, 4).map(_._3).sum / math.min(4, xs.length) }
    val degT = byTgt.map { case (tid, xs) =>
      tid -> topK(xs, _._1, 4).map(_._3).sum / math.min(4, xs.length) }
    val bestS = bySrc.map { case (sid, xs) => sid -> topK(xs, _._2, 1).head }
    val bestT = byTgt.map { case (tid, xs) => tid -> topK(xs, _._1, 1).head }
    val expect = bestS.values.flatMap { case (sid, tid, c) =>
      val den = (degS(sid) + degT(tid)) / 2
      val margin = c / den
      if (den > 0 && margin >= 1.0)
        Some((tid, sid,
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          BigDecimal(margin).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          bestT(tid)._1 == sid))
      else None
    }.toArray.sortBy(_._2)
    assert(mined.toSeq == expect.toSeq)
  }

  test("ppl banding: bands are score-monotonic and cover every " +
      "scored doc") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val out = TextAnalysis.pplBuckets(docs,
      trainFilter = col("doc_id") % 5 === 0)
    val byBand = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("lm_score").as("lo"),
        max("lm_score").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byBand.keySet == Set("head", "middle", "tail"))
    assert(byBand.values.map(_._1).sum == out.count())
    // every head score >= every middle score >= every tail score
    assert(byBand("head")._2 >= byBand("middle")._3)
    assert(byBand("middle")._2 >= byBand("tail")._3)
  }

  test("semantic decontamination drops a planted benchmark twin and " +
      "keeps a far vector") {
    import s.implicits._
    // bucketCol(md5) splits: find one train id and one bench id from
    // the real corpus split, then plant vectors directly.
    val b = Sampling.bucketCol(col("vec_id"))
    val ids = emb.select(col("vec_id"), b.as("bkt")).collect()
    val trainIds = ids.filter(_.getLong(1) < 80).map(_.getLong(0)).sorted
    val benchId = ids.filter(_.getLong(1) >= 90).map(_.getLong(0)).min
    val tw = trainIds(0); val far = trainIds(1)
    val vecs = Seq(
      (tw, Array(1.0f, 0.0f, 0.0f)),   // exact twin of the benchmark
      (far, Array(-1.0f, 0.0f, 0.0f)), // antipode: cosine -1
      (benchId, Array(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(vecs,
        trainFilter = b < 80, benchFilter = b >= 90)
      .orderBy("vec_id").collect()
    assert(out.length == 2)
    val m = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(m(tw) == ((benchId, 1.0, true)))
    assert(m(far) == ((benchId, -1.0, false)))
  }

  test("semantic decontamination: empty benchmark slice keeps every " +
      "train row — never a silently empty frame") {
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(vecs,
        trainFilter = col("vec_id") > 0, benchFilter = col("vec_id") < 0)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.isNullAt(1) && r.isNullAt(2) &&
      !r.getBoolean(3)), "all-kept with null neighbor columns")
  }

  test("triplets: positive shares the anchor's label, negative never " +
      "does, self never a positive") {
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.tripletMine(emb).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      a != p && labels(p) == labels(a) && labels(n) != labels(a)
    })
  }

  test("distinct-n ratios rise with order; confusion counts cover " +
      "the corpus") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val dn = TextAnalysis.distinctNgramRatios(docs).orderBy("n")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(dn.map(_._1).toSeq == Seq(1, 2, 3))
    // higher-order grams are strictly more distinctive on any real text
    assert(dn(0)._3 <= dn(1)._3 && dn(1)._3 <= dn(2)._3)
    val ag = graft.queries.PipelineQueries.textNbAgreement(s, sf)
      .collect().head
    assert((0 to 3).map(ag.getLong).sum == docs.count(),
      "tp+fp+fn+tn must partition the corpus")
  }

  test("domain weights form a distribution and cover every domain") {
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.domainWeights(docs,
      trainFilter = col("doc_id") % 5 === 0).collect()
    val nSources = docs.select("source").distinct().count()
    assert(out.length == nSources)
    val ws = out.map(_.getDouble(3))
    assert(ws.forall(_ > 0))
    assert(math.abs(ws.sum - 1.0) < 1e-4,
      s"softmax weights must sum to ~1, got ${ws.sum}")
  }

  test("quality vote: kept iff >= 2 of the three signals, short docs " +
      "count as a tail vote") {
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet")
      // plant a doc the LM can't score (1 word): its ppl vote is false
      .unionByName(Seq((999999L, "solo", "en", "src0", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.queries.PipelineQueries
      .pipelineQualityVote(s, sf)
    val rows = out.collect()
    assert(rows.forall { r =>
      val votes = Seq(r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
        .count(identity)
      r.getInt(4) == votes && r.getBoolean(5) == (votes >= 2)
    })
    // the planted doc is not in the fixture query; check the rule
    // directly on the composed frame over the augmented corpus
    val gate = TextAnalysis.qualityGate(docs)
      .filter(col("doc_id") === 999999L).collect()
    assert(gate.length == 1)
  }

  test("PR curve: closed-form decile sweep on a rank-ladder corpus") {
    import s.implicits._
    // 20 docs, every id sampled (all % 10 == 0), score ladder 20..1,
    // label = top half. Decile q cutoff = value at desc rank 2q =
    // 21-2q; predicted-positive set = the top 2q docs.
    val df = (0 until 20).map { i =>
      (i * 10L, (20 - i).toDouble, i < 10)
    }.toDF("doc_id", "score", "label")
    val out = TextAnalysis.prCurve(df).orderBy("decile").collect()
    assert(out.length == 9)
    for (r <- out) {
      val q = r.getInt(0)
      assert(r.getDouble(1) == (21 - 2 * q).toDouble)
      val (tp, fp, fnv, tn) =
        if (q <= 5) (2L * q, 0L, 10L - 2 * q, 10L)
        else (10L, 2L * q - 10, 0L, 20L - 2 * q)
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == ((tp, fp, fnv, tn)), s"confusion at decile $q")
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      assert(r.getDouble(6) == r6(tp.toDouble / math.max(tp + fp, 1)))
      assert(r.getDouble(7) == r6(tp.toDouble / math.max(tp + fnv, 1)))
      assert(r.getDouble(8) ==
        r6(2.0 * tp / math.max(2 * tp + fp + fnv, 1)))
    }
  }

  test("PR curve / driftPsi: refuse a sample below 10 with a loud, " +
      "actionable message AT CONSTRUCTION") {
    import s.implicits._
    val tiny = (0 until 30).map(i => (i.toLong, i.toDouble, true))
      .toDF("doc_id", "score", "label") // only ids 0,10,20 sampled
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.prCurve(tiny) // no action on the frame: eager fail
    }
    assert(e.getMessage.contains("minimum-sample contract"))
    assert(e.getMessage.contains("got 3"))
    assert(e.getMessage.contains("widen the slice"),
      "message must tell the caller what to do")
    val tinyV = (0 until 30).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "v")
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.driftPsi(tinyV, col("doc_id") >= 0, "v")
    }
    assert(e2.getMessage.contains("minimum-sample contract"))
    assert(e2.getMessage.contains("widen the slice"))
  }

  test("driftPsi: all ten bins 0..9 always present, even when " +
      "duplicate cutoffs skip bins") {
    import s.implicits._
    // constant reference values: every decile cutoff is 7, so binOf
    // maps v<7 -> 0 and v>=7 -> 9; bins 1..8 are structurally empty
    // and must still appear with zero counts and the smoothing-floor
    // psi term
    val df = (0L until 200L)
      .map(i => (i, if (i < 100) 7L else 3L)).toDF("doc_id", "v")
    val out = TextAnalysis.driftPsi(df, col("doc_id") < 100, "v")
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == (0 to 9),
      "bin spine must emit exactly bins 0..9")
    val mid = out.filter(r => r.getInt(0) >= 1 && r.getInt(0) <= 8)
    assert(mid.forall(r => r.getAs[Long]("ref_n") == 0L &&
      r.getAs[Long]("cur_n") == 0L))
    // both slices have 100 docs, so the smoothed probabilities match
    // and every empty bin's psi term is exactly zero here
    assert(mid.forall(_.getAs[Double]("psi_bin") == 0.0))
    assert(out.head.getAs[Long]("cur_n") == 100L, "cur mass in bin 0")
    assert(out.last.getAs[Long]("ref_n") == 100L, "ref mass in bin 9")
  }

  test("rank AUC: average-rank tie correction, hand-checked; " +
      "degenerate one-class input guarded") {
    import s.implicits._
    // ranks asc with ties averaged: 1.0->1, both 2.0 -> 2.5, 3.0 -> 4
    // R+ = 2.5 + 4 = 6.5; AUC = (6.5 - 3) / (2*2) = 0.875
    val df = Seq((1L, 1.0, false), (2L, 2.0, false),
      (3L, 2.0, true), (4L, 3.0, true))
      .toDF("doc_id", "score", "label")
    val r = TextAnalysis.rankAuc(df).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.875)))
    // perfect separation
    val sep = Seq((1L, 1.0, false), (2L, 5.0, true), (3L, 9.0, true))
      .toDF("doc_id", "score", "label")
    assert(TextAnalysis.rankAuc(sep).collect()(0).getDouble(2) == 1.0)
    // one-class corpus: the greatest() guard keeps the row finite
    val pos = Seq((1L, 5.0, true), (2L, 5.0, true))
      .toDF("doc_id", "score", "label")
    val p1 = TextAnalysis.rankAuc(pos).collect()(0)
    assert(p1.getLong(1) == 0L && p1.getDouble(2) == 0.0)
  }
}
