package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Encoding

/** Pins the mojibake detect/repair operator: the classic
  * UTF-8-seen-as-Latin-1 corruption round-trips bit for bit, genuine
  * prose (ASCII, real accents, CJK) rides the identity path, the
  * malformed-pattern guards refuse rather than emit U+FFFD, and
  * double-encoding repairs by chaining. */
class EncodingSpec extends SparkSpec {

  private def run(c: org.apache.spark.sql.Column, texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), c.as("out"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("repair(corrupt(x)) == x across 2/3/4-byte UTF-8; clean text " +
      "is untouched by the same expression") {
    val samples = Seq(
      "plain ascii only",
      "café déjà vu — naïve",          // 2- and 3-byte
      "中文测试 €100 𝄞 clef",            // 3- and 4-byte (astral)
      "",
      "mixed: é plus 中 plus 𝄞")
    val round = run(Encoding.repairMojibake(
      Encoding.toMojibake(col("text"))), samples: _*)
    samples.zipWithIndex.foreach { case (t, i) =>
      assert(round(i.toLong) === t, s"sample $i")
    }
    val identity = run(Encoding.repairMojibake(col("text")), samples: _*)
    samples.zipWithIndex.foreach { case (t, i) =>
      assert(identity(i.toLong) === t, s"clean sample $i modified")
    }
  }

  test("score: 0 for ASCII and genuine accents, positive for the " +
      "corrupted form") {
    val s = run(Encoding.mojibakeScore(col("text")).cast("string"),
      "ascii", "déjà vu naïve", "Ã© classic mojibake")
    assert(s(0L) === "0")
    assert(s(1L) === "0")
    assert(s(2L) === "1")
    val corrupted = run(Encoding.mojibakeScore(
      Encoding.toMojibake(col("text"))).cast("string"),
      "café 中文")
    // é → 1 signature; each 中文 char → lead+continuation → 1 each
    assert(corrupted(0L).toInt >= 3)
  }

  test("guards: overlong and surrogate byte patterns refuse (no " +
      "U+FFFD is ever emitted); lone continuation bytes refuse") {
    // C0 80 (overlong NUL): C0 is outside the C2-DF lead class
    val overlong = "bad À bytes"
    // ED A0 80 (UTF-8'd surrogate): rejected by the exact sieve's
    // ED second-byte restriction (decode would THROW in Spark 4,
    // so the sieve alone must refuse it)
    val surrogate = "bad í  bytes"
    // a continuation byte with no lead
    val lone = "bad © byte"
    val out = run(Encoding.repairMojibake(col("text")),
      overlong, surrogate, lone)
    assert(out(0L) === overlong)
    assert(out(1L) === surrogate)
    assert(out(2L) === lone)
    assert(!out.values.exists(_.contains("�")))
  }

  test("double-encoded text repairs by chaining two rounds") {
    val twice = Encoding.toMojibake(Encoding.toMojibake(col("text")))
    val once = run(Encoding.repairMojibake(twice), "café")
    assert(once(0L) === "cafÃ©") // one round peels one layer
    val both = run(Encoding.repairMojibake(
      Encoding.repairMojibake(twice)), "café")
    assert(both(0L) === "café")
  }
}
