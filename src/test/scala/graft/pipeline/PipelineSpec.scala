package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Properties the DuckDB oracle can't express: LSH recall against
  * brute-force ground truth, ANN recall, stub-feature determinism,
  * langid mechanics.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val s = spark
  private lazy val docs = s.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = s.read.parquet(s"$sf/embeddings.parquet")

  test("minhash LSH finds the pairs exact Jaccard finds (recall ≥ 0.9)") {
    // ground truth: brute-force all-pairs Jaccard at this tiny SF
    val sets = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val l = sets.select(col("doc_id").as("id_a"), col("sh").as("set_a"))
    val r = sets.select(col("doc_id").as("id_b"), col("sh").as("set_b"))
    val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("j",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val found = Dedup.minhashLsh(docs, numHashes = 32, bands = 16,
      shingleK = 3, jaccardThreshold = 0.5)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    assert(found.subsetOf(truth), "LSH must not report false positives " +
      "(they are Jaccard-verified)")
    if (truth.nonEmpty) {
      val recall = found.size.toDouble / truth.size
      assert(recall >= 0.9, s"recall $recall (found ${found.size}/${truth.size})")
    }
  }

  test("prefix-filtered ngram join equals brute-force all-pairs Jaccard") {
    // ngramJaccard's contract is EXACT (complete candidate generation via
    // prefix filtering), so its output must equal the quadratic baseline.
    // t=0.8 exercises the factors (t/(1+t) = 4/9, 2t/(1+t) = 8/9) whose
    // double rounding lands ABOVE the exact rational — the class of
    // thresholds where an unguarded ceil drops boundary pairs.
    val sets = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val l = sets.select(col("doc_id").as("id_a"), col("sh").as("set_a"))
    val r = sets.select(col("doc_id").as("id_b"), col("sh").as("set_b"))
    for (t <- Seq(0.6, 0.8)) {
      val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
        .withColumn("j",
          size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
            size(array_union(col("set_a"), col("set_b"))))
        .filter(col("j") >= t)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      val found = Dedup.ngramJaccard(docs, k = 3, threshold = t)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      assert(found == truth, s"threshold=$t: " +
        s"missing=${(truth -- found).take(5)} extra=${(found -- truth).take(5)}")
    }
  }

  test("ngram join exactness holds on a random small-vocab corpus") {
    // A 12-word vocabulary forces many borderline-similar pairs, the
    // regime where prefix/positional-filter bugs surface as missing
    // boundary pairs.
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val corpus = (0L until 60L).map { i =>
      val len = 4 + rnd.nextInt(12)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sets = corpus.select(col("doc_id"),
      Dedup.shingles(col("text"), 2).as("sh"))
    val l = sets.select(col("doc_id").as("id_a"), col("sh").as("set_a"))
    val r = sets.select(col("doc_id").as("id_b"), col("sh").as("set_b"))
    for (t <- Seq(0.5, 0.7, 0.85)) {
      val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
        .withColumn("j",
          size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
            size(array_union(col("set_a"), col("set_b"))))
        .filter(col("j") >= t)
        .select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val found = Dedup.ngramJaccard(corpus, k = 2, threshold = t)
        .select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(found == truth, s"threshold=$t: " +
        s"missing=${(truth -- found).take(5)} extra=${(found -- truth).take(5)}")
    }
  }

  test("simhash pairs are symmetric-free and hamming-bounded") {
    val pairs = Dedup.simhashPairs(docs).collect()
    pairs.foreach { p =>
      assert(p.getAs[Long]("id_a") < p.getAs[Long]("id_b"))
      assert(p.getAs[Int]("hamming") <= 3)
    }
  }

  test("embedding near-dup: every reported pair really has cosine ≥ thr") {
    val pairs = Dedup.embeddingNearDup(emb, cosineThreshold = 0.9).collect()
    pairs.foreach(p => assert(p.getAs[Double]("cosine") >= 0.9))
  }

  test("IVF recall vs brute force ≥ 0.6 while scanning fewer vectors") {
    val embD = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val queries = embD.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(embD, queries, k = 5)
      .select("query_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.buildIvf(embD, nlist = 16)
    val approx = Similarity.ivfTopK(index, queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
    // scale property: probing 4/16 cells touches a strict subset
    val probedRows = index.assignments
      .join(broadcast(Similarity.ivfTopK(index, queries, 5, 4)
        .select(col("neighbor")).distinct()),
        col("vec_id") === col("neighbor"), "left_semi").count()
    assert(probedRows <= embD.count())

    // persisted index: same results read back from the lake table, and
    // a probe's cell IN-filter prunes data files at the manifest level
    val loc = java.nio.file.Files.createTempDirectory("ivf-")
      .resolve("index").toString
    val t = Similarity.persistIvf(index, loc)
    val loaded = Similarity.loadIvf(s, loc)
    val fromDisk = Similarity.ivfTopK(loaded, queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDisk == approx, "persisted index must answer identically")
    val m = t.meta
    val (files, _) = graft.lake.Meta.liveFiles(m, m.currentSnapshot.get)
    val pruned = graft.lake.Scan.pruneFiles(m, files,
      Some(col("cell").isin(0, 1, 2, 3)))
    assert(pruned.size < files.size,
      s"${pruned.size} of ${files.size} files for a 4/16-cell probe")
  }

  test("stub multimodal features are deterministic and shaped") {
    val blobs = Multimodal.blobTable(docs.limit(50))
    val f1 = Multimodal.extractFeatures(blobs, dim = 16)
      .orderBy("blob_id").collect()
    val f2 = Multimodal.extractFeatures(blobs, dim = 16)
      .orderBy("blob_id").collect()
    assert(f1.length == 50)
    f1.zip(f2).foreach { case (a, b) =>
      val fa = a.getAs[collection.Seq[Float]]("features")
      val fb = b.getAs[collection.Seq[Float]]("features")
      assert(fa == fb, "stub decode must be deterministic")
      assert(fa.length == 16)
    }
  }

  test("frame sampling yields n frames per video blob") {
    val frames = Multimodal.sampleFrames(Multimodal.blobTable(docs), nFrames = 4)
    val counts = frames.groupBy("blob_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(counts == Set(4L))
  }

  test("language id predicts for every doc with score > 0") {
    val out = TextAnalysis.languageId(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("lang_score") <= 0).count() == 0)
    val langs = out.select("predicted_lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }
}
