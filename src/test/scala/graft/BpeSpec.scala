package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe
import graft.tpch.TpchGraph

/** Pins the BPE trainer against the hand-computed merge sequence of the
  * classic Sennrich et al. 2016 corpus (low/lower/newest/widest), the
  * deterministic tie-break, the greedy apply on an UNSEEN word, and the
  * detokenization invariant the p99 oracle gates at corpus scale. */
class BpeSpec extends SparkSpec {

  // the paper's corpus with frequencies low:5 lower:2 newest:6 widest:3
  private def corpus = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("train: the Sennrich corpus yields the classic merge sequence " +
      "under the (count desc, pair asc) tie-break") {
    // round 1 pair counts: (e,s)=(s,t)=(t,</w>)=9 — lexicographic
    // smallest left wins; rounds 2/3 extend it; round 4 ties (l,o)
    // with (o,w) at 7 — (l,o) wins; round 5 merges (lo,w)
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("tokenize: greedy lowest-rank apply segments an unseen word; " +
      "detok reconstructs; n_tokens counts") {
    import spark.implicits._
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    val res = Bpe.tokenize(
      Seq((0L, "lowest"), (1L, "  Low  NEWEST  "), (2L, ""),
        (3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("tokens"), r.getAs[Int]("n_tokens"),
          r.getAs[String]("detok"))).toMap
    // "lowest" is NOT in the training corpus: (e,s) rank 0 applies
    // first, then (es,t), (est,</w>), (l,o), (lo,w)
    assert(res(0L) === (("low est</w>", 2, "lowest")))
    // casing + whitespace normalize before segmentation; (low,</w>)
    // would be merge 6, so at 5 merges "low" is [low, </w>]
    assert(res(1L) === (("low </w> n e w est</w>", 6, "low newest")))
    assert(res(2L) === (("", 0, "")))
    assert(res(3L) === (("", 0, "")))
  }

  test("detok survives words containing the literal marker text") {
    import spark.implicits._
    // "a</w>b" and a bare "</w>" reconstruct their own characters;
    // only the ONE trailing marker per word is stripped (a global
    // replace corrupted these — review find)
    val d = Seq((0L, "a</w>b </w> x</w>")).toDF("doc_id", "text")
    Seq(0, 4).foreach { k =>
      val merges = Bpe.train(d, "text", numMerges = k)
      val res = Bpe.tokenize(d, "doc_id", "text", merges).collect()(0)
      assert(res.getAs[String]("detok") === "a</w>b </w> x</w>",
        s"numMerges=$k")
    }
  }

  test("astral-plane symbols: train and apply share the codepoint " +
      "grain, so learned merges fire on surrogate-pair characters") {
    import spark.implicits._
    val d = Seq((0L, "𝄞x 𝄞x")).toDF("doc_id", "text")
    val merges = Bpe.train(d, "text", numMerges = 2)
    // pairs (𝄞,x) and (x,</w>) tie at 2 — UTF-8 order puts "x"
    // before 4-byte "𝄞", so (x,</w>) merges first (the distributed
    // tie-break; asserted identical below)
    assert(merges === Seq(("x", "</w>"), ("𝄞", "x</w>")))
    assert(Bpe.train(d, "text", 2, localVocabLimit = -1L) === merges)
    val row = Bpe.tokenize(d, "doc_id", "text", merges).collect()(0)
    // one fused token per word — the UTF-16-half split made the
    // learned merges unmatchable at apply time (detok still passed)
    assert(row.getAs[Int]("n_tokens") === 2)
    assert(row.getAs[String]("tokens") === "𝄞x</w> 𝄞x</w>")
    assert(row.getAs[String]("detok") === "𝄞x 𝄞x")
  }

  test("train: numMerges beyond exhaustion stops at the fixpoint") {
    import spark.implicits._
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    // symbols a b </w>: merges (a,b) then (ab,</w>) then nothing —
    // single-symbol words yield no pairs, so training stops early
    val merges = Bpe.train(tiny, "text", numMerges = 50)
    assert(merges === Seq(("a", "b"), ("ab", "</w>")))
  }

  test("train: driver-side local finish and distributed loop yield " +
      "the identical merge list (Sennrich fixture + corpus slice)") {
    // localVocabLimit = -1 forces the distributed path through the
    // public API; the default routes these bounded vocabs locally
    val kLocal = Bpe.train(corpus, "text", numMerges = 8)
    val kDist = Bpe.train(corpus, "text", numMerges = 8,
      localVocabLimit = -1L)
    assert(kLocal === kDist)
    val docs = TpchGraph.store(spark, "/root/testdata/sf0.001")
      .nodes("documents").filter(col("id") < 40)
    val cLocal = Bpe.train(docs, "text", numMerges = 12)
    val cDist = Bpe.train(docs, "text", numMerges = 12,
      localVocabLimit = -1L)
    assert(cLocal === cDist)
  }

  test("train: the bounded local finish schedules O(1) Spark jobs " +
      "regardless of merge count (the r13 scheduler-bound fix)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = TpchGraph.store(spark, "/root/testdata/sf0.001")
        .nodes("documents")
      docs.count() // materialize store caches outside the window
      jobs.set(0)
      val merges = Bpe.train(docs, "text", numMerges = 200)
      Thread.sleep(1000) // listener events are async; let them settle
      // the synthetic corpus vocabulary exhausts around ~105 merges —
      // still 100+ rounds, plenty to expose a 2-jobs-per-merge shape
      assert(merges.length >= 100)
      // word-count materialize + count-probe + collect (+ at most a
      // couple of Spark-internal jobs) — NEVER 2-per-merge (200+)
      assert(jobs.get() <= 8,
        s"local BPE finish scheduled ${jobs.get()} jobs for " +
          s"${merges.length} merges — the merge loop is running " +
          "distributed again")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("tokenize: tabs/newlines follow the same whitespace contract " +
      "as training and the p99 oracle (advice r13)") {
    import spark.implicits._
    val d = Seq((0L, "\tlow\nnewest \t"), (1L, " \t\n "))
      .toDF("doc_id", "text")
    val res = Bpe.tokenize(d, "doc_id", "text",
      Bpe.train(corpus, "text", numMerges = 5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("detok")).toMap
    // boundary tabs/newlines vanish, interior runs collapse to one
    // space — exactly trim(regexp_replace(lower(t),'\s+',' ','g'))
    assert(res(0L) === "low newest")
    assert(res(1L) === "")
  }

  test("detok invariant holds over a corpus slice for any merge count") {
    val docs = TpchGraph.store(spark, "/root/testdata/sf0.001")
      .nodes("documents").filter(col("id") < 50)
    Seq(0, 3, 12).foreach { k =>
      val merges = Bpe.train(docs, "text", numMerges = k)
      val bad = Bpe.tokenize(docs, "id", "text", merges)
        .select(col("id"), col("detok"))
        .join(docs.select(col("id"),
          regexp_replace(trim(lower(col("text"))), "\\s+", " ")
            .as("want")), Seq("id"))
        .filter(col("detok") =!= col("want"))
      assert(bad.count() === 0, s"detok diverged at numMerges=$k")
    }
  }
}
