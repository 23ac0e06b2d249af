package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.core.Diagnostics
import graft.pipeline.Dedup

/** The zero-extra-job observability channel: executor-fed accumulators
  * checked at job boundaries, warning exactly once driver-side. */
class DiagnosticsSpec extends SparkSpec {

  test("warnOnNonZero fires exactly once with the observed count, and " +
      "never for an accumulator that stays zero") {
    import spark.implicits._
    val fired = new AtomicLong(0)
    val firedValue = new AtomicLong(-1)
    val acc = Diagnostics.warnOnNonZero(spark, "diag.spec.trip") { n =>
      fired.incrementAndGet(); firedValue.set(n)
    }
    val neverFired = new AtomicLong(0)
    Diagnostics.warnOnNonZero(spark, "diag.spec.quiet") { _ =>
      neverFired.incrementAndGet()
    }
    // nothing computed yet → nothing observed
    Diagnostics.drainNow()
    assert(fired.get() === 0)
    // a real job feeds the accumulator from the executors
    val n = spark.range(0, 100, 1, 4)
      .map { i => if (i % 10 == 0) acc.add(1L); i }.count()
    assert(n === 100)
    Diagnostics.drainNow()
    assert(fired.get() === 1, "tripped warning fires")
    assert(firedValue.get() === 10, "reports the observed count")
    // once fired the entry is retired: further jobs cannot re-fire it
    spark.range(0, 50, 1, 2).map { i => acc.add(1L); i }.count()
    Diagnostics.drainNow()
    assert(fired.get() === 1, "warning is one-shot")
    assert(neverFired.get() === 0, "zero accumulator never warns")
  }

  test("concurrent drains fire a tripped warning exactly once (CAS " +
      "claim, not iterator-remove)") {
    // r9 ADVICE: the async listener bus and drainNow (or duplicate
    // listeners) can drain the queue concurrently; the warn must still
    // run at most once. 8 threads hammer drainNow over a pre-tripped
    // accumulator.
    val fired = new AtomicLong(0)
    val acc = Diagnostics.warnOnNonZero(spark, "diag.spec.race") { _ =>
      fired.incrementAndGet(); ()
    }
    acc.add(7L) // tripped before any drain
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val ts = (1 to 8).map(_ => new Thread(() => {
      barrier.await()
      var i = 0
      while (i < 200) { Diagnostics.drainNow(); i += 1 }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(30000))
    assert(fired.get() === 1,
      s"warn ran ${fired.get()} times under concurrent drains")
  }

  test("AccumulateIf generates compilable code and counts under codegen " +
      "(no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GreaterThan, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.IntegerType
    val acc = spark.sparkContext.longAccumulator("diag.spec.codegen")
    val tap = graft.functions.AccumulateIf(
      GreaterThan(BoundReference(0, IntegerType, nullable = false),
        Literal(5)), acc)
    // generate() compiles the code eagerly — a Janino error throws here
    // instead of silently degrading to interpreted eval in production
    val proj = GenerateMutableProjection.generate(Seq(tap))
    (0 until 10).foreach(i => proj(InternalRow(i)))
    assert(acc.value === 4, "codegen path feeds the accumulator")
    // interpreted eval agrees
    val acc2 = spark.sparkContext.longAccumulator("diag.spec.interp")
    val tap2 = graft.functions.AccumulateIf(
      GreaterThan(BoundReference(0, IntegerType, nullable = false),
        Literal(5)), acc2)
    (0 until 10).foreach(i => tap2.eval(InternalRow(i)))
    assert(acc2.value === 4, "interpreted path agrees")
  }

  test("simhashPairs under a tiny maxBucket: truncation trades recall " +
      "only — emitted pairs stay correct, same-sig pairs survive") {
    import spark.implicits._
    // 12 docs in 3 exact-duplicate families of 4: long shared text +
    // one marker word per family keeps the 3 distinct sigs hamming-
    // close, so some 16-bit chunk bucket holds ≥ 2 of them and
    // maxBucket=1 truncates it. Which marker set achieves that depends
    // on xxhash64 bit patterns, so scan deterministic candidates and
    // pin the first that structurally overfills a bucket.
    val shared = (1 to 60).map(i => s"word$i").mkString(" ")
    def corpusFor(k: Int) = (0 until 12).map { i =>
      val fam = i % 3
      (i.toLong, s"$shared marker${fam}v$k")
    }.toDF("doc_id", "text")
    def maxOccupancy(df: org.apache.spark.sql.DataFrame): Long = df
      .select(Dedup.simhash(col("text")).as("sig")).distinct()
      .select(explode(transform(sequence(lit(0), lit(3)), c =>
        concat(c.cast("string"), lit(":"),
          call_function("shiftright", col("sig"), c * 16)
            .bitwiseAND(0xFFFFL).cast("string")))).as("chunk"))
      .groupBy("chunk").count().agg(max("count")).as[Long].head()
    val docs = (0 until 30).iterator.map(corpusFor)
      .find(maxOccupancy(_) > 1)
      .getOrElse(fail("no candidate fixture overfills a chunk bucket " +
        "at maxBucket=1 — loosen the fixture scan"))
    val got = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 1)
    val pairs = got.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact-duplicate (same-sig) pairs are truncation-proof: all 3
    // families × C(4,2)=6 pairs must be present regardless of the cap
    val sameFam = (for {
      a <- 0 until 12; b <- 0 until 12
      if a < b && a % 3 == b % 3
    } yield (a.toLong, b.toLong)).toSet
    assert(sameFam.subsetOf(pairs),
      s"same-signature pairs lost to truncation: ${sameFam -- pairs}")
    // CONTAINMENT under truncation: nothing invented — every emitted
    // pair really is hamming ≤ 3 over the exact signatures
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.simhash(col("text")).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      val d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      assert(d <= 3, s"invented pair ($a,$b) at hamming $d")
    }
  }
}
