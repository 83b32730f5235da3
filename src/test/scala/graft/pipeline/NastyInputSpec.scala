package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Adversarial-document smoke suite: a 100 TB corpus WILL contain
  * empty strings, whitespace-only docs, unicode, control characters,
  * kilobyte single tokens and deeply repeated text — this pins that
  * every per-document text operator (a) doesn't throw, (b) returns
  * exactly one row per input doc, and (c) honors its basic output
  * contract on those shapes. The DuckDB oracle can't see these (the
  * fixtures are clean prose), which is exactly why they live here —
  * the same stance as the constructed-pathology gate spec that caught
  * the round-9 dup-fraction bug.
  */
class NastyInputSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark

  private lazy val nasty: DataFrame = {
    val spark = s
    import spark.implicits._
    Seq(
      (1L, "", "en", "src0"),
      (2L, "   \t  \n  ", "en", "src0"),
      (3L, "a", "de", "src1"),
      (4L, "x" * 4096, "fr", "src2"), // one kilobyte-scale token
      (5L, Seq.fill(500)("dup").mkString(" "), "en", "src3"),
      (6L, "héllo wörld Ünïcode — em–dash … ellipsis", "de", "src0"),
      (7L, "日本語のテキスト と 中文文本 と 한국어 텍스트", "ja", "src1"),
      (8L, "tabs\tandcontrolcharshere", "en", "src2"),
      (9L, "the quick brown fox jumps over the lazy dog and then " +
        "it rests by the river for a while in the warm morning sun as " +
        "the town wakes and a boat drifts past the old mill", "en",
        "src0"),
      (10L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
  }
  private val N = 10L

  private def perDoc(name: String)(out: DataFrame): Unit =
    assert(out.count() == N, s"$name must emit one row per doc")

  test("per-doc text operators survive nasty docs, one row per doc") {
    perDoc("tokenCounts")(TextAnalysis.tokenCounts(nasty))
    perDoc("qualityScore")(TextAnalysis.qualityScore(nasty))
    perDoc("qualityGate")(TextAnalysis.qualityGate(nasty))
    perDoc("repetition")(TextAnalysis.repetition(nasty))
    perDoc("fingerprint")(TextAnalysis.fingerprint(nasty))
    // charEntropy: entropy is undefined on empty support, so the
    // EMPTY doc (and only it) has no row — the oracle replays the
    // same drop; whitespace still counts as characters
    val ent = TextAnalysis.charEntropy(nasty)
    assert(ent.count() == N - 1)
    assert(ent.filter(col("doc_id") === 1L).count() == 0)
    perDoc("oovRate")(TextAnalysis.oovRate(nasty))
    // lmScore scores only docs with >= 2 words (documented: sub-2-word
    // docs are unscorable and count against in the quality vote)
    val scorable = nasty.filter(
      size(split(trim(lower(col("text"))), "\\s+")) >= 2).count()
    assert(TextAnalysis.lmScore(nasty,
      trainFilter = col("doc_id") % 2 === 0).count() == scorable)
    perDoc("nbClassifier")(TextAnalysis.nbClassifier(nasty,
      positive = col("source").isin("src0", "src1")))
    // languageId is a profile scorer (profiles from the %5 split):
    // docs sharing no profile trigram legitimately have no verdict —
    // the contract is "at most one row per doc, never a null verdict"
    val lid = TextAnalysis.languageId(nasty)
    assert(lid.count() <= N)
    assert(lid.filter(col("predicted_lang").isNull).count() == 0)
  }

  test("gate verdicts are sane on the degenerate docs") {
    val out = TextAnalysis.qualityGate(nasty)
      .select(col("doc_id"), col("keep"), col("dup_gram_frac"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getDouble(2)))).toMap
    assert(!out(1L)._1 && !out(2L)._1, "empty/whitespace docs must drop")
    assert(!out(5L)._1, "the 500x-repeated doc must drop")
    assert(out(5L)._2 > 0.9, "dup fraction must see the repetition")
    assert(out(9L)._1, "clean prose must pass")
    // no NaN/negative dup fractions anywhere
    out.values.foreach { case (_, f) =>
      assert(!f.isNaN && f >= 0.0 && f <= 1.0, s"dup frac $f out of range")
    }
  }

  test("corpus-level operators survive nasty docs") {
    assert(TextAnalysis.corpusStats(nasty).count() == 1)
    assert(TextAnalysis.vocabulary(nasty).count() >= 1)
    assert(TextAnalysis.distinctNgramRatios(nasty).count() == 3)
    // BPE over unicode + empty docs: merges are well-formed rounds
    val merges = TextAnalysis.bpeMerges(nasty, rounds = 3)
    assert(merges.length <= 3)
    TextAnalysis.bpeEncode(nasty, rounds = 3).count()
    // exact + near-dup over the nasty corpus (incl. empty-text group)
    assert(Dedup.exact(nasty).count() >= 1)
    Dedup.minhashLsh(nasty, numHashes = 16, bands = 8, shingleK = 2,
      jaccardThreshold = 0.5).count()
    // masking leaves non-PII docs intact — EXCEPT the spaced digit
    // run (doc 10), which is phone-shaped by the documented pattern
    // (a known, oracle-consistent false-positive class of phone
    // regexes; pinned here so a regex change that widens or narrows
    // it is visible)
    val masked = nasty.select(col("doc_id"),
      TextAnalysis.maskPii(col("text")).as("m"), col("text"))
    val changed = masked.filter(col("m") =!= col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(changed == Set(10L), s"unexpected masking: $changed")
  }

  test("sketch rows survive the nasty corpus (empty, unicode, " +
      "kilobyte tokens)") {
    // frequency sketch: well-formed probes, never undercounts even
    // when the corpus is mostly degenerate documents
    val freq = Sketches.cmsFrequency(nasty, topK = 5).collect()
    assert(freq.nonEmpty && freq.length <= 5)
    freq.foreach { r =>
      assert(r.getLong(4) >= 0, s"undercount on nasty corpus: $r")
    }
    // corpus diff: one row, subset dominance holds even when the gate
    // drops nearly everything (these docs mostly fail length/stopword)
    val d = Sketches.corpusDiff(nasty).collect()
    assert(d.length == 1)
    assert(d.head.getLong(1) <= d.head.getLong(0) &&
      d.head.getLong(3) <= d.head.getLong(2) &&
      d.head.getLong(5) <= d.head.getLong(4), s"dominance: ${d.head}")
    // degenerate corpora: docs under 3 words emit NO shingles, so the
    // distinct sketch has no groups (documented kernel contract); the
    // word-level CMS still sees the empty-token rows and stays
    // well-formed at a certifiable topK, and fails LOUDLY (the probe
    // certificate guard) when topK exceeds the corpus vocabulary —
    // never a silently oracle-divergent probe set
    val tiny = nasty.filter(col("doc_id") <= 2)
    assert(Sketches.kmvDistinct(tiny).count() == 0)
    assert(Sketches.cmsFrequency(tiny, topK = 1).count() == 1)
    val e = intercept[Exception](
      Sketches.cmsFrequency(tiny, topK = 3).collect())
    assert(e.getMessage.contains("certificate"),
      s"expected the probe-certificate guard, got: ${e.getMessage}")
    // the source league folds the same gate over the nasty docs: one
    // row per source, doc counts conserved, rates in range
    val league = TextAnalysis.sourceQuality(nasty).collect()
    assert(league.map(_.getLong(1)).sum == nasty.count(),
      "league loses documents")
    league.foreach { r =>
      val kr = r.getDouble(5)
      assert(kr >= 0.0 && kr <= 1.0, s"keep_rate out of range: $r")
    }
  }

  test("simhash contract: NULL texts dropped, duplicate ids kept as-is") {
    val spark = s
    import spark.implicits._
    val df = Seq(
      (1L, Option("alpha beta gamma")),
      (2L, Option.empty[String]),  // NULL text: un-sketchable, dropped
      (3L, Option("alpha beta gamma")),
      (3L, Option("delta epsilon")) // duplicated id: one row EACH
    ).toDF("doc_id", "text")
    val out = Dedup.simhash(df).collect()
    assert(out.length == 3, "one row per non-null input row")
    assert(!out.exists(_.getLong(0) == 2L), "null-text row dropped")
    assert(out.count(_.getLong(0) == 3L) == 2, "dup ids not merged")
    assert(out.forall(!_.isNullAt(1)), "no null sketches escape")
  }

  test("prCurve / driftPsi tolerate NULL scores and values") {
    val spark = s
    import spark.implicits._
    // every 10th id is the deterministic sample slice; make some of
    // those null so an unguarded collect would NPE
    val scored = (1L to 400L).map { i =>
      val nul = i % 40 == 0 // includes sampled ids (% 10 == 0)
      (i, if (nul) None else Some(i.toDouble % 97), i % 3 == 0)
    }.toDF("doc_id", "score", "label")
    val pr = TextAnalysis.prCurve(scored).collect()
    assert(pr.length == 9)
    // null-score rows fall in NO confusion cell (NULL >= t is never
    // true and NULL < t is never true — in Spark and ANSI SQL alike)
    val r1 = pr.find(_.getInt(0) == 1).get
    val total = r1.getLong(2) + r1.getLong(3) + r1.getLong(4) +
      r1.getLong(5)
    assert(total == 400 - 10, s"expected nulls in no cell, got $total")

    val vals = (1L to 400L).map { i =>
      (i, if (i % 40 == 0) None else Some(i % 50))
    }.toDF("doc_id", "v")
    val psi = TextAnalysis.driftPsi(vals, col("doc_id") <= 200, "v")
      .collect()
    assert(psi.nonEmpty)
    // nulls compare false vs every cutoff -> counted in bin 0
    assert(psi.exists(_.getInt(0) == 0))
  }
}
