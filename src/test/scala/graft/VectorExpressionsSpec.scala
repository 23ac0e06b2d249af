package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** Native DotF64/L2SqF64 must match the HOF (zip_with+aggregate)
  * formulation bit-for-bit — including NULL semantics: length mismatch
  * or a null element poisons the result, empty arrays give 0.0.
  */
class VectorExpressionsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType)),
    StructField("b", ArrayType(FloatType))))

  private def df(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (x, y) => Row(x, y) }.asJava, schema)
  }

  test("dot matches HOF formulation bit-for-bit") {
    val data = df(Seq(
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f),
        Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (Seq[java.lang.Float](0.1f, 0.2f), Seq[java.lang.Float](0.3f, 0.7f)),
      (Seq.empty[java.lang.Float], Seq.empty[java.lang.Float])))
    val res = data.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    res.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(res(0).getDouble(0) === 32.0)
    assert(res(2).getDouble(0) === 0.0)
  }

  test("null semantics: length mismatch and null elements poison") {
    val data = df(Seq(
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f)),
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f))))
    val res = data.select(
      VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    assert(res.forall(_.isNullAt(0)))
    // null array input -> null out
    val nullRow = spark.createDataFrame(
      java.util.List.of(Row(null, Seq[java.lang.Float](1.0f))), schema)
    assert(nullRow.select(VectorFunctions.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("l2sq and cosine") {
    val data = df(Seq(
      (Seq[java.lang.Float](1.0f, 0.0f), Seq[java.lang.Float](0.0f, 1.0f)),
      (Seq[java.lang.Float](1.0f, 1.0f), Seq[java.lang.Float](1.0f, 1.0f)),
      (Seq[java.lang.Float](0.0f, 0.0f), Seq[java.lang.Float](1.0f, 1.0f))))
    val res = data.select(
      VectorFunctions.l2sq(col("a"), col("b")).as("l2"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos")).collect()
    assert(res(0).getDouble(0) === 2.0)
    assert(res(0).getDouble(1) === 0.0)
    assert(res(1).getDouble(1) === 1.0000000000000002 ||
      math.abs(res(1).getDouble(1) - 1.0) < 1e-12)
    assert(res(2).getDouble(1) === 0.0) // zero-norm guard
  }

  test("interpreted eval path matches codegen") {
    // force the interpreted path via an off-codegen context: evaluate the
    // expression directly
    val e = graft.functions.DotF64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), ArrayType(FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f), ArrayType(FloatType)))
    assert(e.eval(null) === 11.0)
    val mismatch = graft.functions.DotF64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f), ArrayType(FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f), ArrayType(FloatType)))
    assert(mismatch.eval(null) === null)
  }

  test("ArgMinL2 matches the join+window argmin formulation " +
      "(ties, null distances, empty candidates)") {
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random vectors, plus crafted edges: an exact
    // duplicate centroid pair (distance tie -> lowest cid), a
    // dimension-mismatched centroid (null distance -> NULLS FIRST wins
    // over every finite distance), and a null vector row
    def vec(seed: Long, d: Int): Seq[java.lang.Float] =
      (0 until d).map(i =>
        java.lang.Float.valueOf(((seed * 31 + i * 17) % 13).toFloat))
    val vschema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val vecs = spark.createDataFrame(
      java.util.List.of(
        (0L until 20L).map(i => Row(i, vec(i, 4))) :+
          Row(20L, null): _*),
      vschema)
    val cents = spark.createDataFrame(
      java.util.List.of(
        Row(0L, vec(100, 4)), Row(1L, vec(101, 4)),
        Row(2L, vec(100, 4)), // duplicate of cid 0 -> tie
        Row(3L, vec(102, 3))), // wrong dims -> null distance
      vschema)
    // the former formulation, verbatim
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("c_id").asc)
    val legacy = vecs.join(broadcast(cents
        .select(col("vec_id").as("c_id"), col("embedding").as("cv"))))
      .select(col("vec_id"), col("c_id"),
        VectorFunctions.l2sq(col("embedding"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cands = cents.agg(sort_array(collect_list(
      struct(col("vec_id").as("cid"), col("embedding").as("cv"))))
      .as("__cands"))
    val fused = vecs.crossJoin(broadcast(cands))
      .select(col("vec_id"),
        VectorFunctions.argMinL2(col("embedding"), col("__cands"))
          .as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === legacy)
    // the mismatched-dims centroid (cid 3, null distance) must win
    // every real-vector row per NULLS FIRST — pin it so the edge is
    // really hit (the null-VECTOR row 20 nulls ALL distances, so the
    // lowest cid 0 wins there instead)
    assert(legacy.filter(_._1 != 20L).values.toSet === Set(3L))
    assert(legacy(20L) === 0L)
    // without it: ties resolve to the LOWEST cid (0, never its twin 2)
    val cents2 = cents.filter(col("vec_id") =!= 3L)
    val cands2 = cents2.agg(sort_array(collect_list(
      struct(col("vec_id").as("cid"), col("embedding").as("cv"))))
      .as("__cands"))
    val legacy2 = vecs.join(broadcast(cents2
        .select(col("vec_id").as("c_id"), col("embedding").as("cv"))))
      .select(col("vec_id"), col("c_id"),
        VectorFunctions.l2sq(col("embedding"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused2 = vecs.crossJoin(broadcast(cands2))
      .select(col("vec_id"),
        VectorFunctions.argMinL2(col("embedding"), col("__cands"))
          .as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused2 === legacy2)
    assert(!fused2.values.toSet.contains(2L))
    // the null-vector row assigns (all distances null -> lowest cid),
    // exactly like the window's NULLS FIRST
    assert(fused2(20L) === 0L)
    // empty candidate list -> null -> callers' isNotNull filter drops
    val empty = cents2.filter(lit(false)).agg(sort_array(collect_list(
      struct(col("vec_id").as("cid"), col("embedding").as("cv"))))
      .as("__cands"))
    assert(vecs.crossJoin(broadcast(empty))
      .select(VectorFunctions.argMinL2(col("embedding"), col("__cands")))
      .collect().forall(_.isNullAt(0)))
    // interpreted eval path agrees with codegen on a tie
    val e = graft.functions.ArgMinL2(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), ArrayType(FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(Row(7L, Seq(1.0f, 1.0f)), Row(9L, Seq(1.0f, 1.0f))),
        ArrayType(StructType(Seq(
          StructField("cid", LongType),
          StructField("cv", ArrayType(FloatType)))))))
    assert(e.eval(null) === 7L)
  }

  test("GopherStats fused pass matches the per-column HOF formulation " +
      "on edge corpus (CRLF, bullets, ellipses, unicode, required-word " +
      "case/duplicates)") {
    import spark.implicits._
    val texts: Seq[String] = Seq(
      "the quick brown fox jumps over the lazy dog and that is it",
      "", " ", "\t\n \r\n", null,
      "- bullet one\n* bullet two\n• dot\n‣ tri\n▪ sq\nplain line",
      "ends with dots...\nends with ellipsis…\nends mid... not\n" +
        "CRLF dots...\r\nfour dots....\n…\n...",
      "# hash ## and … ellipsis # inside-token#x",
      "THE BE TO OF AND THAT HAVE WITH", // uppercase required words
      "the the the be be to", // repeats
      "123 456 --- *** ... (no) [alpha] ZZZ aA",
      "naïve café 中文 €∑ the\u000Bvt-separated\ftokens",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕥𝕠𝕜𝕖𝕟𝕤 the", // astral-plane codepoints
      "   leading spaces\n trailing spaces   \n  - spaced bullet\n" +
        "  spaced dots...  ",
      "İstanbul THE Σ σ ς KELVINK the\nand")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // duplicate entry in the required list must count twice; mixed case
    // must normalize (review r15)
    val req = Seq("The", "be", "to", "of", "and", "that", "have",
      "with", "THE")
    val fused = graft.pipeline.TextAnalysis
      .gopherSignals(df, "id", "text", req)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val builtin = graft.pipeline.TextAnalysis
      .gopherSignalsBuiltin(df, "id", "text", req)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fused.keySet === builtin.keySet)
    fused.keySet.foreach { id =>
      assert(fused(id) === builtin(id), s"signals diverge for id=$id")
    }
    // sanity: the duplicate "THE" entry makes n_required reach 9 on the
    // all-required-words doc (id 8)
    val row8 = graft.pipeline.TextAnalysis
      .gopherSignals(df, "id", "text", req)
      .filter(col("id") === 8L).head()
    assert(row8.getAs[Long]("n_required") === 9L)
  }

  test("LineRepStats fused pass matches the array formulation " +
      "(split/trim/distinct/charSum semantics, CRLF, astral plane)") {
    import spark.implicits._
    val texts: Seq[String] = Seq(
      "a\nb\na\n\nb\n\n\na", "", " ", "\n", "\n\n", "\n\n\n",
      "x", "x\n", "\nx", "  padded  \n  padded  \npadded",
      "dup\ndup\ndup\n\ndup\n\ndup", "a\r\nb\r\na", // \r survives trim
      "p1 line1\np1 line2\n\np1 line1\np1 line2\n\nother",
      "𝔘𝔫𝔦 code\n𝔘𝔫𝔦 code\n\n𝔘𝔫𝔦 code", null,
      "tab\ttab\n \n  \nvt")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val raw = coalesce(col("text"), lit(""))
    def nonBlank(c: org.apache.spark.sql.Column) =
      filter(transform(c, l => trim(l)), l => l =!= "")
    def charSum(arr: org.apache.spark.sql.Column) =
      length(array_join(arr, "")).cast("long")
    val lines = nonBlank(split(raw, "\n", -1))
    val paras = nonBlank(split(raw, "\n\n", -1))
    val legacy = df.select(col("id"),
      size(lines).cast("long"),
      (size(lines) - size(array_distinct(lines))).cast("long"),
      charSum(lines), charSum(lines) - charSum(array_distinct(lines)),
      size(paras).cast("long"),
      (size(paras) - size(array_distinct(paras))).cast("long"),
      charSum(paras), charSum(paras) - charSum(array_distinct(paras)))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val st = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LineRepStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(raw)))
    val fused = df.select(col("id"), st.as("__lr"))
      .select(col("id"),
        col("__lr")("n_lines"), col("__lr")("n_dup_lines"),
        col("__lr")("chars_lines"), col("__lr")("chars_dup_lines"),
        col("__lr")("n_paras"), col("__lr")("n_dup_paras"),
        col("__lr")("chars_paras"), col("__lr")("chars_dup_paras"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fused.keySet === legacy.keySet)
    fused.keySet.foreach { id =>
      assert(fused(id) === legacy(id), s"line stats diverge for id=$id")
    }
  }

  test("PolyHash matches the HOF fingerprint formulation on BMP text") {
    import spark.implicits._
    val texts = Seq("The Quick Brown Fox", "", "  spaced  out  ",
      "punktO!? 123", "Ünïcødé tèxt", "a").toDF("text")
    def hof(c: org.apache.spark.sql.Column) =
      aggregate(split(lower(c), ""), lit(7L),
        (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)
    val rows = texts.select(
      graft.pipeline.TextAnalysis.fingerprint(col("text")).as("native"),
      hof(col("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
    // null in, null out; interpreted eval agrees with codegen
    val n = texts.select(graft.pipeline.TextAnalysis.fingerprint(
      lit(null).cast("string"))).collect()
    assert(n.forall(_.isNullAt(0)))
    assert(graft.functions.PolyHash(
      org.apache.spark.sql.catalyst.expressions.Literal("Abc"))
      .eval(null) ===
      ((((7L * 31 + 'a') % 1000000007L) * 31 + 'b') % 1000000007L * 31
        + 'c') % 1000000007L)
  }

  test("TextStats fused pass matches every HOF formulation, " +
      "edge cases included") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis._
    val texts = Seq(
      "the quick brown fox", "", " ", "   ", "\tleading tab",
      "trailing space  ", "a  b   c", "The AND of IT", "one",
      "punct.! (heavy), stuff-; really?:", "line\nbreaks\r\nhere",
      "Ünïcødé wörds the", "vertical\ftab").toDF("text")
    val t = col("text")
    val rows = texts.select(
      stats(t).as("st"),
      tokenCountWs(t).as("h_n"), stopwordCount(t).as("h_stop"),
      aggregate(tokens(t), lit(0L), (acc, x) => acc + length(x))
        .as("h_chars"),
      punctCount(t).as("h_punct"), length(t).as("h_len"),
      qualityScoreFast(t).as("q_fast"), qualityScore(t).as("q_hof"))
      .collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getAs[Int]("n_ws") === r.getAs[Int]("h_n"), r)
      assert(st.getAs[Int]("stop_cnt") === r.getAs[Int]("h_stop"), r)
      assert(st.getAs[Long]("char_sum") === r.getAs[Long]("h_chars"), r)
      assert(st.getAs[Int]("punct_cnt") === r.getAs[Int]("h_punct"), r)
      assert(st.getAs[Int]("n_chars") === r.getAs[Int]("h_len"), r)
      assert(r.getAs[Double]("q_fast") === r.getAs[Double]("q_hof"), r)
    }
  }

  test("MinHashSig matches the min-aggregate SQL formulation bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 50L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong())))
    val df = rows.toDF("id", "sh")
      .select(col("id"), array_distinct(col("sh")).as("sh"))
    val k = 16
    // SQL path: explode + per-family min(xxhash64(s, i))
    val agged = df.select(col("id"), explode(col("sh")).as("s"))
      .groupBy("id")
      .agg(min(xxhash64(col("s"), lit(0))).as("h0"),
        (1 until k).map(i =>
          min(xxhash64(col("s"), lit(i))).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getAs[Long](s"h$i"))).toMap
    // native fused pass
    val fused = df.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.MinHashSig(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("sh")),
          k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, _) =>
      assert(fused(id) === agged(id), s"signature mismatch for id $id")
    }
    // interpreted eval agrees with codegen
    val arr = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(3L, -9L, 42L))
    val viaEval = graft.functions.MinHashSig.compute(arr, 4).toSeq
    val viaDf = Seq((0L, Seq(3L, -9L, 42L))).toDF("id", "sh")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.MinHashSig(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("sh")),
          4)))
      .collect().head.getSeq[Long](0)
    assert(viaEval === viaDf)
  }

  test("SimHash64 matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "the quick brown fox", "THE QUICK BROWN FOX", "  padded  text  ",
      "single", "", "tab\tseparated words", "dup dup dup words words",
      "punctuation, heavy! text? with #symbols")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val both = df.select(col("id"),
      graft.pipeline.Dedup.simhash(col("text")).as("native"),
      graft.pipeline.Dedup.simhashHof(col("text")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[Long]("native") === r.getAs[Long]("hof"),
        s"simhash mismatch for id ${r.getAs[Long]("id")}")
    }
  }

  test("GraftExtensions registers graft_* SQL functions " +
      "(SparkSessionExtensions surface)") {
    graft.functions.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2, " +
        "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 25.0)
    assert(row.getDouble(2) === 1.0)
    // the injector path wires the same triples
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext) // must not throw
  }

  test("GramTopStats matches the exploded groupBy formulation on " +
      "seeded random docs (counts and lengths per n)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(77)
    val words = IndexedSeq("a", "bb", "ccc", "dd中", "e", "ff", "𝄞g")
    def doc(): String = (0 until rnd.nextInt(30)).map(_ =>
      words(rnd.nextInt(words.length))).mkString(" ") +
      (if (rnd.nextBoolean()) "\n extra  spaced\tline" else "")
    val docs = (0L until 100L).map(i => (i, doc())).toDF("id", "text")
    val fused = docs.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.GramTopStats(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            coalesce(col("text"), lit(""))), Seq(2, 3))).as("g"))
      .select(col("id"), col("g")("top2_cnt"), col("g")("top2_len"),
        col("g")("top3_cnt"), col("g")("top3_len"))
    // reference: explicit gram strings, exploded and counted
    val toks = filter(split(trim(coalesce(col("text"), lit(""))),
      "\\s+"), t => t =!= "")
    def ref(n: Int) = docs.select(col("id"), toks.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("w")) - n + 1),
        i => array_join(slice(col("w"), i, lit(n)), " "))).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("id").agg(max(struct(col("cnt"),
        length(col("gram")).cast("long"))).as("w"))
      .select(col("id"), col("w")("cnt").as(s"top${n}_cnt"),
        col("w")(s"col2").as(s"top${n}_len"))
    val r2 = ref(2).collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    val r3 = ref(3).collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    fused.collect().foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) ===
        r2.getOrElse(id, (0L, 0L)), s"n=2 doc $id")
      assert((r.getLong(3), r.getLong(4)) ===
        r3.getOrElse(id, (0L, 0L)), s"n=3 doc $id")
    }
  }

  test("DupGramCoverage matches the exploded union formulation on " +
      "seeded random docs (covered word chars per n)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(177)
    // small vocabulary → real duplicate 2/3-grams at doc scale
    val words = IndexedSeq("a", "bb", "ccc", "dd中", "e", "𝄞g")
    def doc(): String = (0 until rnd.nextInt(40)).map(_ =>
      words(rnd.nextInt(words.length))).mkString(" ") +
      (if (rnd.nextBoolean()) "\n a bb  a bb\ta bb" else "")
    val docs = (0L until 100L).map(i => (i, doc())).toDF("id", "text")
    val fused = docs.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.DupGramCoverage(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            coalesce(col("text"), lit(""))), Seq(2, 3))).as("g"))
      .select(col("id"), col("g")("n_word_chars"),
        col("g")("dup2_chars"), col("g")("dup3_chars"))
    // reference: explicit gram strings, window-counted duplicates,
    // exploded offsets, DISTINCT covered positions, summed lengths
    val toks = filter(split(trim(coalesce(col("text"), lit(""))),
      "\\s+"), t => t =!= "")
    val wbase = docs.select(col("id"), toks.as("w"))
    val wl = wbase.select(col("id"),
      posexplode(col("w")).as(Seq("p", "word")))
    val wtot = wl.groupBy("id")
      .agg(sum(length(col("word"))).cast("long").as("wchars"))
    def ref(n: Int) = {
      val grams = wbase.filter(size(col("w")) >= n)
        .select(col("id"), posexplode(transform(
          sequence(lit(1), size(col("w")) - n + 1),
          i => array_join(slice(col("w"), i, lit(n)), " ")))
          .as(Seq("j", "gram")))
      val dup = grams
        .withColumn("c", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id", "gram")))
        .filter(col("c") >= 2)
      dup.select(col("id"), explode(sequence(col("j"),
          col("j") + n - 1)).as("p")).distinct()
        .join(wl, Seq("id", "p"))
        .groupBy("id")
        .agg(sum(length(col("word"))).cast("long").as(s"dup$n"))
    }
    val r2 = ref(2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r3 = ref(3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wt = wtot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fused.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === wt.getOrElse(id, 0L), s"wchars doc $id")
      assert(r.getLong(2) === r2.getOrElse(id, 0L), s"n=2 doc $id")
      assert(r.getLong(3) === r3.getOrElse(id, 0L), s"n=3 doc $id")
    }
  }

  test("HtmlEntityDecode matches the built-in split+replace " +
      "formulation on seeded adversarial entity soup") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(4242)
    val frags = IndexedSeq(
      "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;", "&amp;",
      "&amp;lt;", "&#38;lt;", "&amp;#65;", "&#65;", "&#x41;",
      "&#x1F600;", "&#128512;", "&#0;", "&#xD800;", "&#1114112;",
      "&#12345678;", "&#x1234567;", "&#;", "&#x;", "&#", "&#x",
      "&", "&&", "&l", "&lt", "&ampamp;", "&nbsp", "&#65", "&#65;;",
      "plain", " text ", "中文", "𝄞", "a&b", ";", "&#x2b;&#43;")
    def doc(): String =
      (0 until rnd.nextInt(24)).map(_ =>
        frags(rnd.nextInt(frags.length))).mkString
    val docs = {
      import spark.implicits._
      ((0L until 300L).map(i => (i, doc())) :+ (300L, "")).toDF("id", "t")
    }
    val both = docs.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.HtmlEntityDecode(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            col("t")))).as("fused"),
      graft.pipeline.TextAnalysis.decodeEntitiesBuiltin(col("t"))
        .as("builtin"))
    both.collect().foreach { r =>
      assert(r.getString(1) === r.getString(2), s"doc ${r.getLong(0)}")
    }
  }

  test("ivfAssign accepts integral (non-bigint) ids and restores the " +
      "id type on the cluster column") {
    // the r16 ArgMinL2 rewrite pinned the candidate cid to bigint,
    // breaking int-id callers the former join+window accepted (ADVICE
    // r16); integral ids now cast in and the winner casts back
    import scala.jdk.CollectionConverters._
    val sch = StructType(Seq(
      StructField("vec_id", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    def mk(rows: Seq[(Int, Seq[Float])]) = spark.createDataFrame(
      rows.map { case (i, v) =>
        Row(i, v.map(java.lang.Float.valueOf))
      }.asJava, sch)
    val vecs = mk(Seq(1 -> Seq(0f, 0f), 2 -> Seq(10f, 0f),
      3 -> Seq(0.4f, 0f), 4 -> Seq(9.6f, 0f)))
    val cents = mk(Seq(1 -> Seq(0f, 0f), 2 -> Seq(10f, 0f)))
    val out = graft.pipeline.Similarity
      .ivfAssign(vecs, cents, "vec_id", "embedding")
    assert(out.schema("cluster").dataType === IntegerType)
    assert(out.collect().map(r => (r.getInt(0), r.getInt(2))).sorted
      === Array((1, 1), (2, 2), (3, 1), (4, 2)))
  }
}
