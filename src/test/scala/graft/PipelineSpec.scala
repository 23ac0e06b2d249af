package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.EventStreams

/** Smoke + behavior tests for the training-data pipeline operators and the
  * streaming path (north star, SURVEY.md §2.10 / §2.7).
  */
class PipelineSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "a"),
      (1L, "the quick brown fox jumps over the lazy cat", "a"), // near-dup of 0
      (2L, "completely different content about spark engines", "a"),
      (3L, "the quick brown fox jumps over the lazy dog", "b")  // exact dup of 0
    ).toDF("doc_id", "text", "src")
  }

  test("exact dedup groups identical texts") {
    val res = Dedup.exact(docs, "doc_id", Seq("text")).collect()
    assert(res.length === 3)
    val byCnt = res.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cnt"))
      .toMap
    assert(byCnt(0L) === 2) // doc 0 and 3 merge, min id 0 representative
  }

  test("incremental dedup drops only corpus-known keys") {
    val newBatch = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") >= 2)
    val corpus = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") < 2)
    val kept = Dedup.exactAgainst(newBatch, corpus, Seq("text"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // doc 3 duplicates doc 0's text (in corpus) -> dropped; doc 2 is new
    assert(kept === Set(2L))
  }

  test("minhash LSH finds planted near-dup, skips distinct") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", numHashes = 32,
      bands = 16, shingleK = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // near-dup found
    assert(pairs.contains((0L, 3L))) // exact dup found
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // distinct text out
  }

  test("simhash: identical texts have distance 0, near-dups small") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2).toLong)).toMap
    assert(pairs((0L, 3L)) === 0L) // identical
    assert(pairs.contains((0L, 1L))) // near-dup within hamming budget
  }

  test("blocked n-gram jaccard respects blocks") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "src",
      k = 2, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L))) // 0-3 cross-block, 2 dissimilar
  }

  test("cosine pairs: brute force and LSH agree on found pairs") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val bf = Dedup.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf === Set((0L, 1L)))
    val lsh = Dedup.cosinePairsLsh(vecs, "vec_id", "embedding", 0.9,
      planes = 6).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(bf)) // LSH may miss, never invents
  }

  test("brute-force ANN top-k ranks by cosine") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      k = 2).collect().sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("nn_id")).toSeq
    assert(res === Seq(1L, 3L))
  }

  test("IVF assigns to nearest centroid and probes") {
    import spark.implicits._
    val vecs = (0L to 19L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i, base.map(_ + (i / 100.0f)))
    }.toDF("vec_id", "embedding")
    val centroids = vecs.filter(col("vec_id") < 2)
    val assigned = Similarity.ivfAssign(vecs, centroids)
    assert(assigned.count() === 20)
    val top = Similarity.ivfTopK(assigned, centroids,
      vecs.filter(col("vec_id") === 0), k = 3, nProbe = 1).collect()
    assert(top.length === 3)
    // probing cluster 0 only → all neighbors share vec 0's parity
    assert(top.forall(_.getAs[Long]("nn_id") % 2 === 0))
  }

  test("semDedup: within-cluster lower-id neighbor wins, cross-cluster " +
      "near-dups survive") {
    import spark.implicits._
    // two well-separated blobs; ids 0/1 near-identical, 2 distinct in
    // the same blob; ids 10/11 near-identical in the other blob
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.02f)),
      (2L, Array(0.8f, 0.6f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.02f, 0.999f))
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(vecs, nClusters = 2, iters = 2,
        threshold = 0.99).collect()
      .map(r => r.getAs[Long]("vec_id")).toSet
    // 1 drops to 0, 11 drops to 10; 2 is below threshold to both peers
    assert(kept === Set(0L, 2L, 10L))
    // the keep-rule is exactly "no lower-id same-cluster neighbor at
    // cosine >= t": recompute pairs and check both directions
    val centroids = Similarity.ivfTrain(vecs, 2, 2)
    val assigned = Similarity.ivfAssign(vecs, centroids).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val raw = vecs.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toIndexedSeq).toMap
    def cos(a: IndexedSeq[Float], b: IndexedSeq[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    raw.keys.foreach { id =>
      val hasLower = raw.keys.exists(o => o < id &&
        assigned(o) == assigned(id) && cos(raw(o), raw(id)) >= 0.99)
      assert(kept.contains(id) === !hasLower, s"keep-rule broken for $id")
    }
  }

  test("semDedup: skew probe fires on a degenerate all-identical " +
      "cluster, stays silent when balanced, never changes results") {
    import spark.implicits._
    // 200 identical embeddings: k-means collapses them into ONE
    // cluster no matter what k is — the silent-quadratic case
    val vecs = (0L until 200L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.ivfTrain(vecs, 4, 2)
    val assigned = Similarity.ivfAssign(vecs, centroids)
    val msg = Dedup.semDedupSkew(assigned, maxPairsPerCluster = 1000L)
    assert(msg.isDefined, "degenerate cluster must trip the probe")
    assert(msg.get.contains("200") && msg.get.contains("raise nClusters"))
    // 200*199/2 = 19900 pairs: a budget above it stays silent
    assert(Dedup.semDedupSkew(assigned, 20000L).isEmpty)
    // end to end with the tripping budget: semantics unchanged —
    // min-id canonicalization keeps exactly vector 0
    val kept = Dedup.semDedup(vecs, nClusters = 4, iters = 2,
      threshold = 0.99, maxPairsPerCluster = 1000L)
    assert(kept.collect().map(_.getAs[Long]("vec_id")).toSet === Set(0L))
  }

  test("stripHtml: block contents die, tags strip, entities decode " +
      "once, whitespace collapses; plain text is untouched") {
    import spark.implicits._
    val cases = Seq(
      (0L, "<p>hello <b>world</b></p>", "hello world"),
      // script BODY containing markup must not leak
      (1L, "a<script>var x = \"<p>leak</p>\";</script>b", "a b"),
      (2L, "x<style type=\"css\">p{}</style>y<!-- hidden -->z", "x y z"),
      // one-pass entity decode: &amp;lt; → &lt;, never <
      (3L, "&lt;tag&gt; &amp; &amp;lt; &quot;q&quot; &nbsp;done",
        "<tag> & &lt; \"q\" done"),
      (4L, "no markup at all", "no markup at all"),
      (5L, "spaced\n\n\t text", "spaced text"),
      (6L, null.asInstanceOf[String], ""),
      // numeric character references (r14 missing #4): decimal, hex,
      // astral plane; BMP max decimal boundary
      (7L, "&#65;&#x42; snow:&#9731; emoji:&#x1F600; max:&#1114111;",
        "AB snow:☃ emoji:😀 max:􏿿"),
      // invalid scalar values stay verbatim: NUL, surrogate,
      // out-of-range decimal and hex
      (8L, "&#0; &#xD800; &#1114112; &#x110000;",
        "&#0; &#xD800; &#1114112; &#x110000;"),
      // &amp;#65; single-decodes to the literal &#65;, never to A
      (9L, "&amp;#65; and &#38;#66;", "&#65; and &#66;"),
      // a numeric-decoded & must NOT feed the named pass (one-pass
      // contract, review r15): &#38;lt; is the literal &lt;, not <
      (10L, "&#38;lt; &#38;amp; &#38;gt;x", "&lt; &amp; &gt;x"))
    val got = cases.map { case (i, in, _) => (i, in) }
      .toDF("id", "html")
      .select(col("id"),
        graft.pipeline.TextAnalysis.stripHtml(col("html")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (i, _, want) =>
      assert(got(i) === want, s"case $i")
    }
  }

  test("gopherSignals: every signal hand-checked; the pass bit " +
      "applies the paper's thresholds in integer form") {
    import spark.implicits._
    // 60 words, all alphabetic incl. 'the'+'of', no symbols/bullets
    val good = (1 to 58).map(i => s"word$i").mkString("the of ", " ", "")
    val cases = Seq(
      (0L, good),
      // bullet wall: 5 of 5 lines are bullets (>= 90%)
      (1L, (1 to 5).map(i => s"- item $i").mkString("\n")),
      // ellipsis endings: 2 of 3 lines (> 30%)
      (2L, "first one...\nsecond one…\nthird stays"),
      // symbol soup: 8 symbols over 6 words (> 10%)
      (3L, "a # b # c … d # e ## f #…"),
      (4L, ""), (5L, null.asInstanceOf[String]))
    val got = graft.pipeline.TextAnalysis.gopherSignals(
      cases.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_sym"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_bullet"), r.getAs[Long]("n_ellipsis"),
          r.getAs[Long]("n_alpha_words"), r.getAs[Long]("n_required"),
          r.getAs[Int]("gopher_pass")))).toMap
    // good: 60 words; chars = 3+2 + len("word1..9")*9 + len(..10..58)*49
    assert(got(0L) === ((60L, 5L + 5L * 9L + 6L * 49L, 0L, 1L, 0L, 0L,
      60L, 2L, 1)))
    // bullets: 15 words, 5 lines all bullets → fails the 90% rule
    // (and the 50-word floor); only 'item' per line is alphabetic
    assert(got(1L) === ((15L, 30L, 0L, 5L, 5L, 0L, 5L, 0L, 0)))
    assert(got(2L)._6 === 2L) // two ellipsis-terminated lines
    assert(got(2L)._4 === 3L)
    assert(got(2L)._9 === 0)
    val s3 = got(3L)
    assert(s3._3 === 8L && s3._1 === 12L && s3._9 === 0,
      s"symbol case: $s3")
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0)))
    assert(got(5L) === got(4L))
    // the required-word list is a language dial: a custom list flips
    // n_required (and the pass bit's last conjunct) for the same text
    val custom = graft.pipeline.TextAnalysis.gopherSignals(
      cases.toDF("id", "text"), "id", "text",
      requiredWords = Seq("word1", "word2", "item"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("n_required")).toMap
    assert(custom(0L) === 2L && custom(1L) === 1L)
  }

  test("bigramLm: counts hand-checked, logprob follows the smoothing " +
      "formula, sub-2-token docs drop") {
    import spark.implicits._
    val d = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val res = graft.pipeline.TextAnalysis.bigramLm(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_c2"),
          r.getAs[Long]("sum_c1"), r.getAs[Double]("logprob"),
          r.getAs[Double]("ppl"))).toMap
    // corpus bigrams: (a,b) x3, (b,a) x1, (b,c) x1; prefixes a=3, b=2;
    // vocab = {a, b, c, x, ""} = 5
    val (n0, s20, s10, lp0, _) = res(0L)
    assert((n0, s20, s10) === ((3L, 7L, 8L))) // (a,b)+(b,a)+(a,b)
    val want0 = 2 * math.log(4.0 / 8.0) + math.log(2.0 / 7.0)
    assert(math.abs(lp0 - want0) < 1e-12)
    val (n1, s21, s11, lp1, ppl1) = res(1L)
    assert((n1, s21, s11) === ((2L, 4L, 5L)))
    val want1 = math.log(4.0 / 8.0) + math.log(2.0 / 7.0)
    assert(math.abs(lp1 - want1) < 1e-12)
    assert(math.abs(ppl1 - math.exp(-want1 / 2)) < 1e-12)
    // 1-token and empty docs have no bigrams and emit no row
    assert(res.size === 2)
  }

  test("text analysis signals") {
    val r = TextAnalysis.annotate(docs, "text")
      .filter(col("doc_id") === 0).collect()(0)
    assert(r.getAs[Int]("n_tokens") === 9)
    assert(r.getAs[String]("lang_pred") === "en")
    assert(r.getAs[Double]("stopword_ratio") > 0.2)
    val fp = TextAnalysis.annotate(docs, "text").select("doc_id", "fingerprint")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(fp(0L) === fp(3L)) // identical text, identical fingerprint
    assert(fp(0L) !== fp(1L))
  }

  test("multimodal decode: deterministic stub over binary payloads") {
    val media = Multimodal.attachBinary(docs, "doc_id", "text")
    val dec = Multimodal.decode(media).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    val len0 = "the quick brown fox jumps over the lazy dog".length
    assert(dec(0L) === (len0 % 1024 + 1, len0 % 768 + 1))
    val frames = Multimodal.sampleFrames(media, n = 3, frameBytes = 8)
    assert(frames.count() === docs.count() * 3)
    // resize bounds the payload, refreshes metadata, and composes with
    // decode (media-column shape preserved)
    val small = Multimodal.resize(media, maxBytes = 16)
    val sizes = small.collect().map(r =>
      (r.getAs[Array[Byte]]("media").length,
        r.getStruct(r.fieldIndex("meta")).getAs[Long]("n_bytes")))
    assert(sizes.forall { case (n, m) => n <= 16 && n.toLong == m && n > 0 })
    assert(Multimodal.decode(small).count() === docs.count())
  }

  test("streaming: windowed stats with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "etype", "value")
    val q = EventStreams.windowedStats(events, "10 minutes", Some("5 minutes"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
        (ts(11), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("win_agg").collect()
        .map(r => (r.getAs[String]("etype"), r.getAs[Long]("n"),
          r.getAs[Double]("total"))).toSet
      assert(out === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming near-dup filter: LSH band state over a memory " +
      "stream equals the batch keep-first twin, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy cat tonight"),
      (2L, "completely different content about spark engines here"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "yet another unrelated document about parquet files"),
      (5L, "the quick brown fox jumps over the lazy dog today"))
    val batchDf = corpus.toDF("id", "text")
    val expected = Dedup.nearDupKeepFirst(batchDf, "id", "id", "text",
        numHashes = 64, bands = 32, shingleK = 2, threshold = 0.6)
      .collect().filter(_.getInt(1) === 1).map(_.getLong(0)).toSet
    assert(expected.nonEmpty) // the fixture plants real near-dups
    val mem = MemoryStream[(Long, String)]
    val arrivals = Dedup.bandArrivals(
      mem.toDF().toDF("id", "text"), "id", "id", "text",
      numHashes = 64, bands = 32, shingleK = 2)
      .as[EventStreams.BandDoc]
    val q = EventStreams.nearDupBandDups(arrivals, threshold = 0.6)
      .writeStream.format("memory").queryName("neardup_hits")
      .outputMode("append").start()
    try {
      // split across micro-batches: state must carry bucket members
      mem.addData(corpus.take(3).map { case (i, t) => (i, t) }: _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3).map { case (i, t) => (i, t) }: _*)
      q.processAllAvailable()
      val got = spark.table("neardup_hits").collect()
        .map(_.getAs[Long]("id")).toSet
      assert(got === expected)
      // hits reference an earlier doc (keep-first: dupOf < id here)
      spark.table("neardup_hits").collect().foreach { r =>
        assert(r.getAs[Long]("dupOf") < r.getAs[Long]("id"))
      }
    } finally q.stop()
  }

  test("streaming rate limiter: per-key windowed quota over a memory " +
      "stream equals the batch twin, window resets across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val winNs = 1000L
    // key 1: 4 requests in window 0 (one over quota), 2 in window 2;
    // key 2: 3 requests spanning a window boundary
    val reqs = Seq(
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
      (1L, 400L, 13L), (1L, 2100L, 14L), (1L, 2200L, 15L),
      (2L, 900L, 20L), (2L, 950L, 21L), (2L, 1100L, 22L))
    val batch = EventStreams.rateLimitBatch(
      reqs.toDF("key", "ts", "id"), "key", "ts", "id",
      maxPerWindow = 3, windowNs = winNs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(batch(13L)._2 === 0) // 4th in window loses
    assert(batch(14L)._2 === 1) // new window resets
    assert(batch(22L)._2 === 1) // key 2's boundary crossing admits
    val mem = MemoryStream[(Long, Long, Long)]
    val stream = EventStreams.rateLimitStream(
      mem.toDF().toDF("key", "ts", "id")
        .as[EventStreams.FetchReq],
      maxPerWindow = 3, windowNs = winNs)
    val q = stream.writeStream.format("memory")
      .queryName("rate_adm").outputMode("append").start()
    try {
      mem.addData(reqs.take(4): _*) // first micro-batch: window 0
      q.processAllAvailable()
      mem.addData(reqs.drop(4): _*) // later windows cross batches
      q.processAllAvailable()
      val got = spark.table("rate_adm").collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("win"), r.getAs[Int]("admitted"))).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming dedup: first arrival survives, state watermark-bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "fp", "value")
    val q = EventStreams.dedupStream(events, Seq("fp"), Some("10 minutes"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      mem.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(3), "b", 3.0))
      q.processAllAvailable()
      mem.addData((ts(4), "a", 4.0), (ts(5), "c", 5.0))
      q.processAllAvailable()
      val out = spark.table("dedup_stream").collect()
        .map(r => (r.getAs[String]("fp"), r.getAs[Double]("value"))).toSet
      assert(out === Set(("a", 1.0), ("b", 3.0), ("c", 5.0)))
    } finally q.stop()
    // batch path = plain dropDuplicates
    val batch = Seq((new java.sql.Timestamp(0L), "x", 1.0),
      (new java.sql.Timestamp(1L), "x", 2.0)).toDF("ts", "fp", "value")
    assert(EventStreams.dedupStream(batch, Seq("fp")).count() === 1)
  }

  test("streaming: stream-static enrichment join is streaming-legal") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the static side needs no watermark and keeps NO state — each
    // micro-batch hash-joins against the (broadcastable) dimension;
    // this is the standard event-enrichment shape at any scale
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = mem.toDF().toDF("ts", "uid", "value")
      .join(dim, Seq("uid"), "left_outer")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      mem.addData((ts(1), 1L, 10.0), (ts(2), 3L, 30.0))
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("uid"), r.getAs[Double]("value"),
          r.getAs[String]("tier"))).toSet
      assert(out === Set((1L, 10.0, "gold"), (3L, 30.0, null)))
    } finally q.stop()
  }

  test("streaming: durable parquet sink resumes from its checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def start() = mem.toDF().toDF("ts", "etype", "value")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q1 = start()
    try {
      mem.addData((ts(1), "click", 1.0), (ts(2), "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the same checkpoint: only NEW data lands — the
    // sink's commit log makes the restart exactly-once, no duplicates
    mem.addData((ts(3), "click", 3.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getAs[String]("etype"),
        r.getAs[Double]("value"))).toSet
    assert(out === Set(("click", 1.0), ("view", 2.0), ("click", 3.0)))
  }

  test("streaming: stream-stream interval join, watermark-bounded state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lmem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val rmem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val l = lmem.toDF().toDF("ts", "uid", "l_tag")
    val r = rmem.toDF().toDF("r_ts", "r_uid", "r_tag")
    val q = EventStreams.intervalJoin(l, r, "uid", "r_uid", "r_ts",
      "10 MINUTES", Some("5 minutes"))
      .select("l_tag", "r_tag")
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      // keep event times away from the epoch: the initial watermark sits
      // AT 1970-01-01, and rows landing within the delay of it hit the
      // late-input path before the watermark ever advances
      def ts(min: Int) = new java.sql.Timestamp((100 + min) * 60000L)
      lmem.addData((ts(0), 1L, "signup1"))
      rmem.addData((ts(5), 1L, "in_window"), (ts(15), 1L, "too_late"),
        (ts(3), 2L, "other_user"))
      q.processAllAvailable()
      val out = spark.table("ij").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out === Set(("signup1", "in_window")))
    } finally q.stop()
  }

  test("streaming: interval-join state is EVICTED once the watermark " +
      "passes (both stores shrink, not just stop matching)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lmem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val rmem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val l = lmem.toDF().toDF("ts", "uid", "l_tag")
    val r = rmem.toDF().toDF("r_ts", "r_uid", "r_tag")
    val q = EventStreams.intervalJoin(l, r, "uid", "r_uid", "r_ts",
      "10 MINUTES", Some("5 minutes"))
      .select("l_tag", "r_tag")
      .writeStream.format("memory").queryName("ij_evict")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      // batch 1: two rows that will become stale
      lmem.addData((ts(100), 1L, "old_l"))
      rmem.addData((ts(105), 1L, "old_r"))
      q.processAllAvailable()
      val peak = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(peak >= 2, s"expected both sides buffered, state=$peak")
      // batch 2 jumps event time far ahead on BOTH sides (the global
      // watermark is the min across sources), batch 3 makes the updated
      // watermark take effect on the state stores
      lmem.addData((ts(300), 2L, "new_l"))
      rmem.addData((ts(305), 2L, "new_r"))
      q.processAllAvailable()
      lmem.addData((ts(320), 3L, "n3l"))
      rmem.addData((ts(325), 3L, "n3r"))
      q.processAllAvailable()
      val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
      val removed = progs.map(_.stateOperators.apply(0).numRowsRemoved).sum
      val finalTotal = progs.last.stateOperators.apply(0).numRowsTotal
      assert(removed >= 2,
        s"watermark passed the old rows but evicted only $removed")
      assert(finalTotal <= 4,
        s"state should hold only the recent rows, has $finalTotal")
    } finally q.stop()
  }

  test("corpus clean: quality gate + exact dedup composition") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the quick brown fox is in the house of the dog"),
      (1L, "the quick brown fox is in the house of the dog"), // dup of 0
      (2L, "zx qw nb vc xp dj")                               // low quality
    ).toDF("doc_id", "text")
    val res = graft.pipeline.Corpus.clean(corpus, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cnt")))
    assert(res.toSet === Set((0L, 2L)))
  }

  test("ivfTrain: Lloyd refinement converges to the two blobs") {
    import spark.implicits._
    val vecs = ((0L to 9L).map(i => (i, Array(10.0f + i * 0.1f, 0.0f))) ++
      (10L to 19L).map(i => (i, Array(0.0f, 10.0f + i * 0.1f))))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.ivfTrain(vecs, k = 2, iters = 3)
    val cs = centroids.collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
      .sortBy(_.head)
    assert(cs.length === 2)
    // one centroid near (0, ~10.7), the other near (~10.4, 0)
    assert(cs(0)(0) < 1.0f && cs(0)(1) > 9.0f)
    assert(cs(1)(0) > 9.0f && cs(1)(1) < 1.0f)
  }

  test("pqTrain/pqEncode: subspace codebooks separate planted blobs, " +
      "codes reconstruct to the right cluster") {
    import spark.implicits._
    // 4-dim vectors, m=2 → two 2-dim subspaces; blobs interleave by
    // id parity so the lowest-id init (ids 0, 1) spans BOTH blobs —
    // with a one-blob init, empty clusters collapse away (the
    // ivfTrain/Lloyd contract)
    val vecs = (0L to 19L).map { i =>
      if (i % 2 == 0)
        (i, Array(10.0f + i * 0.1f, 0.0f, 0.0f, 5.0f))
      else
        (i, Array(0.0f, 0.0f, 0.0f, 25.0f + i * 0.1f))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vecs, m = 2, k = 2, iters = 3)
    assert(cb.count() === 4) // 2 subspaces × 2 centroids
    val codes = Similarity.pqEncode(vecs, cb, m = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("s")) ->
        r.getAs[Long]("code")).toMap
    assert(codes.size === 40) // 20 vectors × 2 subspaces
    // each subspace's two blobs get distinct codes, consistent within
    for (s <- 0 to 1) {
      val lo = (0L to 19L by 2).map(i => codes((i, s))).toSet
      val hi = (1L to 19L by 2).map(i => codes((i, s))).toSet
      assert(lo.size === 1 && hi.size === 1 && lo != hi,
        s"subspace $s: $lo vs $hi")
    }
    // deterministic retrain
    val cb2 = Similarity.pqTrain(vecs, m = 2, k = 2, iters = 3)
    assert(cb2.collect().map(_.toString).sorted.toSeq ===
      cb.collect().map(_.toString).sorted.toSeq)
    // ADC top-k: every neighbor of an even-id (blob A) query is
    // even-id — the approximate distance separates the planted blobs
    val codesDf = Similarity.pqEncode(vecs, cb, m = 2)
    val top = Similarity.pqTopK(codesDf, cb,
      vecs.filter(col("vec_id") === 0L), k = 5, m = 2).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Long]("nn_id") % 2 === 0L),
      top.map(_.getAs[Long]("nn_id")).mkString(","))
  }

  test("sessionization: gap closes sessions (batch execution path)") {
    import spark.implicits._
    import graft.streaming.EventStreams.SessionEvent
    def ev(min: Int) =
      SessionEvent(1L, new java.sql.Timestamp(min * 60000L), "click")
    // flatMapGroupsWithState runs on static Datasets too (single
    // invocation per key, empty initial state) — same operator code as
    // the streaming path, deterministic to assert
    val sessions = EventStreams.sessionize(
      Seq(ev(0), ev(1), ev(30), ev(31), ev(60)).toDS(),
      gapMs = 5 * 60000L, useTimeout = false).collect()
      .map(s => (s.start.getTime / 60000, s.end.getTime / 60000,
        s.n_events)).toSet
    // two sessions closed by gaps; the t=60 session remains open in state
    assert(sessions === Set((0L, 1L, 2), (30L, 31L, 2)))
  }

  test("duplicated-substring spans: detect, merge, and bound") {
    import spark.implicits._
    // k=3 grams; docs 0 and 1 share "a b c d" (grams "a b c" and
    // "b c d" -> one merged span) plus a separated shared run "x y z"
    val d = Seq(
      (0L, "a b c d q q1 q2 x y z"),
      (1L, "p p1 a b c d p2 p3 x y z"),
      (2L, "totally unrelated words here seven eight nine ten")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).toSet
    // doc 0: "a b c d" at tokens 0-3, "x y z" at 7-9
    // doc 1: "a b c d" at tokens 2-5, "x y z" at 8-10; doc 2: nothing
    assert(spans === Set((0L, 0L, 3L), (0L, 7L, 9L),
      (1L, 2L, 5L), (1L, 8L, 10L)))
    // a doc shorter than k produces no grams and no spans
    val short = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(short, "doc_id", "text", k = 3)
      .count() === 0)
    // adjacency merge: the whole doc collapses to ONE span when every
    // gram is duplicated
    val full = Seq((0L, "m n o p q"), (1L, "m n o p q"))
      .toDF("doc_id", "text")
    val fs = Dedup.duplicatedSpans(full, "doc_id", "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    assert(fs === Set((0L, 0L, 4L), (1L, 0L, 4L)))
  }

  test("remove spans: token surgery, case kept, remnant floor") {
    import spark.implicits._
    // doc 0/1 share "a b c d" and "x y z"; doc 2 is clean; docs 3/4 are
    // full duplicates (empty remnant -> dropped); case survives removal
    val d = Seq(
      (0L, "a b c d E f g x y z"),
      (1L, "q r a b c d s t x y z"),
      (2L, "u v w"),
      (3L, "m n o p q"),
      (4L, "m n o p q")).toDF("doc_id", "text")
    val out = Dedup.removeSpans(d, "doc_id", "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_removed"))).toSet
    assert(out === Set(
      (0L, "E f g", 3L, 7L),
      (1L, "q r s t", 4L, 7L),
      (2L, "u v w", 3L, 0L)))
    // minKeptTokens = 0 keeps the fully-covered docs as empty remnants
    val all = Dedup.removeSpans(d, "doc_id", "text", k = 3,
      minKeptTokens = 0L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"))).toSet
    assert(all.contains((3L, "", 0L)) && all.contains((4L, "", 0L)))
    // null and whitespace-only text count as ZERO tokens (r12 advice:
    // previously the lone "" split token made n_kept = 1, so an empty
    // doc survived the floor that drops fully-deduplicated real docs):
    // both drop at the default floor of 1, both survive floor 0 with
    // n_kept = 0 — consistent with the fully-covered-remnant case —
    // and the null never null-propagates into n_kept
    val withNull = Seq((0L, "a b c"), (1L, null), (2L, "   "))
      .toDF("doc_id", "text")
    val out2 = Dedup.removeSpans(withNull, "doc_id", "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"))).toSet
    assert(out2 === Set((0L, "a b c")))
    val out3 = Dedup.removeSpans(withNull, "doc_id", "text", k = 3,
      minKeptTokens = 0L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_removed"))).toSet
    assert(out3 === Set((0L, "a b c", 3L, 0L), (1L, "", 0L, 0L),
      (2L, "", 0L, 0L)))
  }

  test("spans against: batch spans from batch+corpus gram counts") {
    import spark.implicits._
    // corpus holds "a b c d" once; batch doc 10 repeats it (batch 1 +
    // corpus 1 = 2 -> duplicated), batch docs 11/12 share "x y z w"
    // within the batch alone, doc 13 is clean
    val corpus = Seq(
      (0L, "a b c d and some corpus padding here"),
      (1L, "other corpus text entirely different")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "intro a b c d outro"),
      (11L, "x y z w eleven"),
      (12L, "pre x y z w"),
      (13L, "nothing shared at all")).toDF("doc_id", "text")
    val cg = Dedup.spanGramCounts(corpus, "doc_id", "text", k = 4)
    val out = Dedup.spansAgainst(batch, cg, "doc_id", "text", k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    assert(out === Set((10L, 1L, 4L), (11L, 0L, 3L), (12L, 1L, 4L)))
    // surgery twin: the same batch cleaned against the same counts
    val cleaned = Dedup.removeSpansAgainst(batch, cg, "doc_id", "text",
      k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_removed"))).toSet
    assert(cleaned === Set(
      (10L, "intro outro", 2L, 4L),
      (11L, "eleven", 1L, 4L),
      (12L, "pre", 1L, 4L),
      (13L, "nothing shared at all", 4L, 0L)))
    // batch re-ingested against its own counts double-counts every
    // gram: with minCount = 2 every gram qualifies and each doc is one
    // full-cover span (doc 0: 9 tokens, doc 1: 5 tokens, k = 4) — the
    // re-ingestion-of-an-already-ingested-batch shape
    val self = Dedup.spansAgainst(corpus,
      Dedup.spanGramCounts(corpus, "doc_id", "text", k = 4),
      "doc_id", "text", k = 4, minCount = 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    assert(self === Set((0L, 0L, 8L), (1L, 0L, 4L)))
  }

  test("shuffle shards: deterministic xxhash64 permutation") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val out = graft.pipeline.Curation.shuffleShards(ids, "doc_id", 16)
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("shard"), r.getAs[Long]("sort_key"),
      r.getAs[Long]("pos")))
    // permutation: every id exactly once; shard = pmod(hash, 16)
    assert(rows.map(_._1).sorted.toSeq === (0L until 200L))
    rows.foreach { case (_, shard, key, _) =>
      assert(shard === ((key % 16) + 16) % 16)
    }
    // positions are dense 0..n-1 within each shard, ordered by sort_key
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (0L until g.length))
      assert(g.sortBy(_._4).map(_._3).toSeq === g.map(_._3).sorted.toSeq)
    }
    // stable under input partitioning
    val again = graft.pipeline.Curation
      .shuffleShards(ids.repartition(7), "doc_id", 16)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard"), r.getAs[Long]("sort_key"),
        r.getAs[Long]("pos"))).toSet
    assert(again === rows.toSet)
  }

  test("c4Clean: line rules (terminal punct, 5 words, javascript, " +
      "policy phrases) and page rules (sentences, lorem ipsum, curly, " +
      "badwords) hand-checked") {
    import spark.implicits._
    val good = "This is a good sentence one.\n" +
      "Here is another good sentence two!\n" +
      "And a third full sentence here?"
    val cases = Seq(
      (0L, good),
      // line drops: too few words / no terminal punct / javascript /
      // policy phrase — one good line survives but page fails (< 3
      // sentences)
      (1L, "Too short.\n" +
        "this line has no terminal punctuation at all\n" +
        "Please enable javascript to view this page.\n" +
        "We updated our privacy policy effective today.\n" +
        "Only this line is a keeper sentence."),
      // page fails on lorem ipsum even though lines pass
      (2L, good + "\nThe lorem ipsum block was pasted here once."),
      // page fails on a curly brace ANYWHERE (even a dropped line)
      (3L, good + "\nfunction f() {"),
      (4L, ""), (5L, null.asInstanceOf[String]))
    val got = graft.pipeline.TextAnalysis.c4Clean(
      cases.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean"), r.getAs[Long]("n_lines_kept"),
          r.getAs[Long]("n_sentences"), r.getAs[Int]("c4_pass")))).toMap
    assert(got(0L) === ((good, 3L, 3L, 1)))
    assert(got(1L) ===
      (("Only this line is a keeper sentence.", 1L, 1L, 0)))
    assert(got(2L)._4 === 0 && got(2L)._2 === 4L)
    assert(got(3L)._4 === 0 && got(3L)._1 === good)
    assert(got(4L) === (("", 0L, 0L, 0)))
    assert(got(5L) === got(4L))
    // the badwords blocklist is a parameter: token-grain,
    // case-insensitive, raw-page scope
    val flagged = graft.pipeline.TextAnalysis.c4Clean(
      Seq((0L, good + "\nBADWORD here in a dropped line")).toDF(
        "id", "text"), "id", "text", badWords = Seq("badword"))
      .collect().head
    assert(flagged.getAs[Int]("c4_pass") === 0)
    assert(flagged.getAs[String]("clean") === good)
  }

  test("dedupLines: keep-first across documents in (id, pos) order; " +
      "within-doc repeats dedup; blank lines survive; boilerplate " +
      "schema") {
    import spark.implicits._
    val d = Seq(
      (2L, "shared line\nuniq two\nshared line"),
      (1L, "uniq one\n\nshared line"),
      (3L, "shared line\nonly here")
    ).toDF("id", "text")
    val got = graft.pipeline.Curation.dedupLines(d, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed")))).toMap
    // doc 1 wins "shared line" (lowest id); blank line is structure
    assert(got(1L) === (("uniq one\n\nshared line", 3L, 0L)))
    // doc 2 loses both copies (cross-doc AND the within-doc repeat)
    assert(got(2L) === (("uniq two", 1L, 2L)))
    assert(got(3L) === (("only here", 1L, 1L)))
    // minKeptLines floors: a doc reduced below the floor drops
    val floored = graft.pipeline.Curation.dedupLines(
      Seq((1L, "same\nsame"), (2L, "same")).toDF("id", "text"),
      "id", "text", minKeptLines = 1L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(floored === Set(1L)) // doc 2's only line lost to doc 1
  }

  test("normalizeUnicode: NFC composes and folds singletons, NFD " +
      "decomposes, NFKC folds compatibility chars; ASCII unchanged; " +
      "null in null out; bad form refuses") {
    import spark.implicits._
    val d = Seq(
      (0L, "e\u0301 A\u0308"),  // decomposed e+acute, A+diaeresis
      (1L, "\u212B"),            // ANGSTROM SIGN -> NFC singleton
      (2L, "\uFB01 plain ascii"), // fi-ligature survives NFC
      (3L, null.asInstanceOf[String]))
    def norm(form: String) = d.toDF("id", "text").select(col("id"),
      graft.pipeline.TextAnalysis.normalizeUnicode(col("text"), form)
        .as("n")).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[String]("n")).toMap
    val nfc = norm("NFC")
    assert(nfc(0L) === "\u00E9 \u00C4")
    assert(nfc(1L) === "\u00C5")
    assert(nfc(2L) === "\uFB01 plain ascii")
    assert(nfc(3L) === null)
    assert(norm("NFKC")(2L) === "fi plain ascii")
    assert(norm("NFD")(0L) === "e\u0301 A\u0308")
    // interpreted eval agrees with codegen
    assert(graft.functions.UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("e\u0301"),
      "NFC").eval(null).toString === "\u00E9")
    intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.normalizeUnicode(col("text"), "NFX")
    }
  }

  test("gopherRepetition: duplicate line/paragraph skeleton and " +
      "top-n-gram signals hand-checked; pass bit applies the paper's " +
      "thresholds in integer form") {
    import spark.implicits._
    val longText = (1 to 30).map(i => s"word${i}x").mkString(" ") + "."
    val cases = Seq(
      (0L, "a b\na b\nc d"),          // dup line; "a b" top 2-gram x2
      (1L, "para one\n\npara one"),   // dup paragraph (and line)
      (2L, longText),                 // all distinct → passes
      (3L, ""), (4L, null.asInstanceOf[String]))
    val got = graft.pipeline.TextAnalysis.gopherRepetition(
      cases.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r0 = got(0L)
    assert(r0.getAs[Long]("n_lines") === 3L)
    assert(r0.getAs[Long]("n_dup_lines") === 1L)
    assert(r0.getAs[Long]("chars_lines") === 9L)
    assert(r0.getAs[Long]("chars_dup_lines") === 3L)
    assert(r0.getAs[Long]("n_paras") === 1L)
    assert(r0.getAs[Long]("top2_cnt") === 2L)
    assert(r0.getAs[Long]("top2_len") === 3L)
    // 3-grams all count 1, tie → LONGEST (all len 5 here)
    assert(r0.getAs[Long]("top3_cnt") === 1L)
    assert(r0.getAs[Long]("top3_len") === 5L)
    // dup-line fraction 1/3 > 0.30 → fail
    assert(r0.getAs[Int]("rep_pass") === 0)
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_paras") === 2L)
    assert(r1.getAs[Long]("n_dup_paras") === 1L)
    assert(r1.getAs[Long]("n_dup_lines") === 1L)
    assert(r1.getAs[Int]("rep_pass") === 0)
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_dup_lines") === 0L)
    assert(r2.getAs[Int]("rep_pass") === 1)
    // empty and null: all-zero skeleton, vacuous pass
    Seq(3L, 4L).foreach { i =>
      assert(got(i).getAs[Long]("n_lines") === 0L)
      assert(got(i).getAs[Long]("top2_cnt") === 0L)
      assert(got(i).getAs[Int]("rep_pass") === 1)
    }
  }

  test("filterBlockedHosts: label-boundary suffix match, userinfo/" +
      "port/case stripped, schemeless and null kept, empty list no-op") {
    import spark.implicits._
    val d = Seq(
      (0L, "http://ads.example.com/x"),          // exact → blocked
      (1L, "https://x.ads.example.com/y"),       // subdomain → blocked
      (2L, "http://notads.example.com/z"),       // NOT a suffix match
      (3L, "http://example.com/"),               // parent domain kept
      (4L, "ftp://user:p@ADS.Example.COM:21/q"), // userinfo+port+case
      (5L, "no-scheme-at-all"),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "url")
    val kept = graft.pipeline.Curation.filterBlockedHosts(
      d, "id", "url", Seq("ads.example.com"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 5L, 6L))
    assert(graft.pipeline.Curation.filterBlockedHosts(
      d, "id", "url", Nil).count() === 7L)
  }

  test("dedupSentenceSpans: keep-first 3-sentence spans corpus-wide; " +
      "within-doc repeats cut; overlap unions; floor drops emptied docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "A one. B two. C three. X unique."),
      (2L, "A one. B two. C three. Y other."),
      (3L, "Z only here."),
      (4L, "S a. S b. S c. S a. S b. S c."),
      (5L, "A one. B two. C three.")
    ).toDF("id", "text")
    val got = graft.pipeline.Curation.dedupSentenceSpans(
      d, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed")))).toMap
    // doc 1 wins the shared span; doc 2 loses sentences 0-2
    assert(got(1L) === (("A one. B two. C three. X unique.", 4L, 0L)))
    assert(got(2L) === (("Y other.", 1L, 3L)))
    assert(got(3L) === (("Z only here.", 1L, 0L)))
    // within-doc repeat: the second occurrence of the span cuts
    assert(got(4L) === (("S a. S b. S c.", 3L, 3L)))
    // doc 5 is ONLY the losing span: emptied, floored out
    assert(!got.contains(5L))
  }

  test("dedupLines / dedupSentenceSpans keep-first works for STRING " +
      "ids too (the cast-to-long null trap); blocklist accepts a " +
      "DataFrame") {
    import spark.implicits._
    val d = Seq(
      ("docB", "shared line\nuniq b"),
      ("docA", "shared line\nuniq a")).toDF("id", "text")
    val got = graft.pipeline.Curation.dedupLines(d, "id", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 'docA' < 'docB' lexicographically: docA keeps the shared line
    assert(got("docA") === "shared line\nuniq a")
    assert(got("docB") === "uniq b")
    val sp = Seq(
      ("z2", "A one. B two. C three. Y other."),
      ("a1", "A one. B two. C three. X unique."))
      .toDF("id", "text")
    val spOut = graft.pipeline.Curation.dedupSentenceSpans(
      sp, "id", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(spOut("a1") === "A one. B two. C three. X unique.")
    assert(spOut("z2") === "Y other.")
    // blocklist as a DataFrame (the production form)
    val urls = Seq((1L, "http://ads.example.com/x"),
      (2L, "http://ok.example/y")).toDF("id", "url")
    val kept = graft.pipeline.Curation.filterBlockedHosts(urls,
      "id", "url", Seq("ads.example.com").toDF("domain"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }

  test("dedupLines is idempotent: after keep-first, every surviving " +
      "non-blank line is corpus-unique, so a second pass removes " +
      "nothing (seeded random corpus)") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    val pool = (1 to 12).map(i => s"line pool $i")
    def doc(): String = (0 until 1 + rnd.nextInt(6)).map(_ =>
      if (rnd.nextInt(4) == 0) "" else pool(rnd.nextInt(pool.length)))
      .mkString("\n")
    val d = (0L until 60L).map(i => (i, doc())).toDF("id", "text")
    val once = graft.pipeline.Curation.dedupLines(d, "id", "text",
      minKeptLines = 0L)
    val twice = graft.pipeline.Curation.dedupLines(
      once.withColumnRenamed("clean_text", "text")
        .select("id", "text"), "id", "text", minKeptLines = 0L)
    assert(twice.filter(col("n_removed") > 0).count() === 0)
    assert(rowBag(twice.select(col("id"), col("clean_text"))) ===
      rowBag(once.select(col("id"), col("clean_text"))))
  }

  test("robotsAllowed: RFC 9309 group selection, longest-match, " +
      "Allow tie-break, wildcards, anchors, comments — hand-checked") {
    import spark.implicits._
    def ok(rules: String, path: String, agent: String = "graftbot") =
      Seq((rules, path)).toDF("r", "p")
        .select(graft.pipeline.TextAnalysis.robotsAllowed(
          col("r"), col("p"), agent)).head().getBoolean(0)
    val basic = "User-agent: *\nDisallow: /private/\n"
    assert(!ok(basic, "/private/x"))
    assert(ok(basic, "/public/x"))
    assert(ok(basic, "/privat"))
    // exact group beats *: the * group's blanket disallow must NOT
    // leak into an agent that has its own group
    val grouped = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: GraftBot\nAllow: /docs/\nDisallow: /\n"
    assert(ok(grouped, "/docs/page"))       // longest match is Allow
    assert(!ok(grouped, "/other"))          // exact group's Disallow /
    assert(!ok(grouped, "/x", agent = "otherbot")) // falls to *
    // an exact group that allows everything (no rules) shadows *
    val shadow = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nDisallow:\n"
    assert(ok(shadow, "/anything"))
    // consecutive User-agent lines share one group
    val multi = "User-agent: graftbot\nUser-agent: other\n" +
      "Disallow: /both/\n"
    assert(!ok(multi, "/both/x"))
    assert(!ok(multi, "/both/x", agent = "other"))
    // wildcards and the $ anchor
    val wild = "User-agent: *\nDisallow: /*.pdf$\n"
    assert(!ok(wild, "/a/b.pdf"))
    assert(ok(wild, "/a/b.pdfx"))   // anchored: must END at .pdf
    assert(ok(wild, "/a/pdf"))
    val mid = "User-agent: *\nDisallow: /a/*/c\n"
    assert(!ok(mid, "/a/b/c"))
    assert(!ok(mid, "/a/b/cd"))     // prefix match past the pattern
    assert(ok(mid, "/a/bc"))
    // Allow wins an exact length tie
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    assert(ok(tie, "/p/x"))
    // comments strip; unknown fields (Sitemap, Crawl-delay) ignored;
    // CRLF tolerated; field names case-insensitive
    val messy = "User-Agent: * # all bots\r\n" +
      "Crawl-delay: 10\r\nSitemap: http://x/s.xml\r\n" +
      "DISALLOW: /secret/ # keep out\r\n"
    assert(!ok(messy, "/secret/a"))
    assert(ok(messy, "/open"))
    // no rules at all / empty body → allowed
    assert(ok("", "/anything"))
    assert(ok("# only comments\n", "/x"))
    // §2.2.4: unknown records (Crawl-delay/Sitemap) between
    // consecutive User-agent lines do NOT split the group — graftbot
    // and otherbot share ONE group and both inherit its rules (a
    // parser that resets the run would give graftbot a rule-less
    // group = allowed everywhere)
    val interleaved = "User-agent: graftbot\nCrawl-delay: 2\n" +
      "Sitemap: http://x/s.xml\nUser-agent: otherbot\nDisallow: /x\n"
    assert(!ok(interleaved, "/x/page"))
    assert(!ok(interleaved, "/x/page", agent = "otherbot"))
    assert(ok(interleaved, "/y"))
    // ...but an Allow/Disallow rule DOES end the run: a later
    // User-agent starts a fresh group
    val twoGroups = "User-agent: graftbot\nDisallow: /a\n" +
      "User-agent: otherbot\nDisallow: /b\n"
    assert(!ok(twoGroups, "/a1"))
    assert(ok(twoGroups, "/b1"))
    // §2.2.2: specificity is OCTETS, not UTF-16 units — Disallow /日
    // (4 UTF-8 bytes, 2 UTF-16 units) beats Allow /*b (3 bytes,
    // 3 units) on a path both match
    val octet = "User-agent: *\nAllow: /*b\nDisallow: /日\n"
    assert(!ok(octet, "/日ab"))   // UTF-16 length would flip this
    assert(ok(octet, "/cab"))    // only the Allow matches
    assert(graft.functions.RobotsAllowed.utf8Length("/日") === 4)
    assert(graft.functions.RobotsAllowed.utf8Length("/*b") === 3)
    assert(graft.functions.RobotsAllowed.utf8Length("/𝄞") === 5)
  }

  test("langIdNgram: trigram-profile classification hand-checked — " +
      "en/fr/de/es sentences classify, ties break to the smallest " +
      "tag, zero overlap is und, codepoint-grain trigrams") {
    import spark.implicits._
    val cases = Seq(
      (0L, "The thing is that the kings and the animals of this " +
        "land are going to the station in the morning."),
      (1L, "le chat est sur la table et les enfants sont dans le " +
        "jardin avec les autres pour que tout aille bien sur place"),
      (2L, "der hund ist in dem haus und die kinder sind bei ihnen " +
        "in der schule und das wetter ist schlecht bei ihnen"),
      (3L, "el perro esta en la casa y los otros estan con el " +
        "padre en la ciudad para el verano con los amigos"),
      (4L, "zzzz qqqq xxxx"),          // no profile overlap → und
      (5L, ""), (6L, null.asInstanceOf[String]),
      (7L, "𝄞𝄞𝄞")) // astral only
    val got = cases.toDF("id", "text")
      .select(col("id"), graft.pipeline.TextAnalysis.langIdNgram(
        col("text")).as("l"))
      .select(col("id"), col("l")("lang").as("lang"),
        col("l")("hits").as("hits"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(0L)._1 === "en", got(0L))
    assert(got(1L)._1 === "fr", got(1L))
    assert(got(2L)._1 === "de", got(2L))
    assert(got(3L)._1 === "es", got(3L))
    assert(got(4L) === (("und", 0L)))
    assert(got(5L) === (("und", 0L)))
    assert(got(6L) === (("und", 0L)))
    assert(got(7L) === (("und", 0L))) // 3 astral cps → 1 trigram, no hit
    // custom profiles: tie between two languages breaks to the
    // smallest tag
    val tied = Seq((0L, "abc")).toDF("id", "text")
      .select(graft.pipeline.TextAnalysis.langIdNgram(col("text"),
        Seq("zz" -> Seq("abc"), "aa" -> Seq("abc"))).as("l"))
      .select(col("l")("lang")).head().getString(0)
    assert(tied === "aa")
  }

  test("langIdTrainedProfiles: deterministic top-k per label, " +
      "lang-ascending order, astral trigrams legal in the classifier") {
    import spark.implicits._
    val labeled = Seq(
      (0L, "en", "the cat and the dog and the fox"),
      (1L, "mus", "𝄞a𝄞a𝄞a𝄞"),
      (2L, "en", "the bird and the bee")).toDF("id", "lang", "text")
    val prof = TextAnalysis.langIdTrainedProfiles(
      labeled, "lang", "text", k = 4)
    assert(prof.map(_._1) === Seq("en", "mus"))
    val en = prof.toMap.apply("en")
    assert(en.length === 4 && en.forall(_.length === 3))
    // 'mus' trigrams contain the astral 𝄞 (3 codepoints, 4-5 UTF-16
    // units) — the constructor's codepoint-grain require accepts them
    val mus = prof.toMap.apply("mus")
    assert(mus.forall(t => t.codePointCount(0, t.length) === 3))
    assert(mus.exists(_.length > 3))
    // train→classify round trip: each slice classifies to its label
    val lid = TextAnalysis.langIdNgram(col("text"), prof)
    val got = labeled.select(col("id"),
        lid.getField("lang").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "en" && got(1L) === "mus" && got(2L) === "en")
    // training is idempotent/deterministic (ties broken by tri asc)
    val prof2 = TextAnalysis.langIdTrainedProfiles(
      labeled, "lang", "text", k = 4)
    assert(prof2 === prof)
  }
}
