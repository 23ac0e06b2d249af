package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dsir
import graft.tpch.TpchGraph

/** Pins the DSIR importance-weighting operator (Xie et al. 2023)
  * against hand-computed feature counts and the closed-form logw,
  * the seeded determinism of Gumbel top-k resampling, and the
  * string-vs-hashed-bucket consistency of the integer skeleton. */
class DsirSpec extends SparkSpec {

  // target doc 0 "a b a": features a,b,a,"a b","b a" (Tt = 5)
  // source doc 1 "a c":   features a,c,"a c"         (Ts = 3)
  private def fixture = {
    import spark.implicits._
    Seq((0L, "a b a"), (1L, "a c"), (2L, "b b"))
      .toDF("doc_id", "text")
  }

  test("weights: hand-computed integer skeleton and closed-form logw") {
    val df = fixture
    val w = Dsir.weights(df,
      df.filter(col("doc_id") === 0), df.filter(col("doc_id") === 1),
      "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("sum_tc"),
          r.getAs[Long]("sum_sc"), r.getAs[Double]("logw"))).toMap
    // doc 0: occurrences a(tc2,sc1) b(1,0) a(2,1) "a b"(1,0) "b a"(1,0)
    assert(w(0L)._1 === 5L)
    assert(w(0L)._2 === 7L)
    assert(w(0L)._3 === 2L)
    // doc 2 "b b": b(1,0) b(1,0) "b b"(0,0) → 2ln2 + 3(ln4 − ln6)
    assert(w(2L)._1 === 3L)
    assert(w(2L)._2 === 2L)
    assert(w(2L)._3 === 0L)
    val want2 = 2 * math.log(2.0) +
      3 * (math.log(4.0) - math.log(6.0))
    assert(math.abs(w(2L)._4 - want2) < 1e-12)
    // doc 1 "a c": a(2,1) c(0,1) "a c"(0,1)
    assert((w(1L)._1, w(1L)._2, w(1L)._3) === ((3L, 2L, 3L)))
    val want1 = math.log(3.0) - 3 * math.log(2.0) +
      3 * (math.log(4.0) - math.log(6.0))
    assert(math.abs(w(1L)._4 - want1) < 1e-12)
  }

  test("weights: empty-text docs emit no row (matches the SQL replay)") {
    import spark.implicits._
    val df = Seq((0L, "a"), (1L, ""), (2L, " \t "),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ids = Dsir.weights(df, df, df, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(0L))
  }

  test("hashed buckets: a collision-free bucket count reproduces the " +
      "string-feature integer skeleton; tiny bucket counts still total") {
    val docs = TpchGraph.store(spark, "/root/testdata/sf0.001")
      .nodes("documents").filter(col("id") < 60)
    val t = docs.filter(col("id") % 3 === 0)
    def skeleton(buckets: Int) =
      Dsir.weights(docs, t, docs, "id", "text", buckets)
        .select("id", "n_feats", "sum_tc", "sum_sc")
    // 2^31 buckets: ~3.5k distinct features → expected collisions
    // ~0.003 (deterministic either way — measured collision-free);
    // 2^20 buckets already showed real birthday collisions
    assert(rowBag(skeleton(0)) === rowBag(skeleton(Int.MaxValue)))
    // aggressive hashing (the paper's 10k buckets): n_feats per doc is
    // hash-invariant; summed counts can only GROW (collisions merge
    // feature classes)
    val strings = skeleton(0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    skeleton(100).collect().foreach { r =>
      val (nf, tc) = strings(r.getLong(0))
      assert(r.getLong(1) === nf)
      assert(r.getLong(2) >= tc)
    }
  }

  test("resample: seeded Gumbel top-k is deterministic, k bounds the " +
      "sample, and higher-weight docs win at equal noise opportunity") {
    val docs = TpchGraph.store(spark, "/root/testdata/sf0.001")
      .nodes("documents").filter(col("id") < 80)
    val w = Dsir.weights(docs, docs.filter(col("id") % 3 === 0), docs,
      "id", "text").transform(graft.core.Materialize(_))
    val a = Dsir.resample(w, "id", k = 10, seed = 7L)
      .collect().map(_.getAs[Long]("id")).toSet
    val b = Dsir.resample(w, "id", k = 10, seed = 7L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(a === b)
    assert(a.size === 10)
    // a different seed redraws (overwhelmingly likely to differ)
    val c = Dsir.resample(w, "id", k = 10, seed = 8L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(c.size === 10)
    // k >= n returns everything
    assert(Dsir.resample(w, "id", k = 10000, seed = 7L).count()
      === w.count())
  }
}
