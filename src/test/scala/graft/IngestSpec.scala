package graft

import java.io.{ByteArrayOutputStream, File}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Ingest

/** Round-trip and failure-path coverage for the compressed-JSONL
  * ingestion operator ([[Ingest]]): zstd/gzip/plain shards in one
  * directory (per-file magic sniff), newline-bearing text through JSON
  * escaping, strict-vs-monitoring corrupt handling, and the shard
  * writer's idempotent overwrite. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def tmpDir(): String =
    Files.createTempDirectory("graft_ingest_spec").toString

  test("zstd round-trip: shards written by executors, re-ingested " +
      "exactly, multi-line text survives JSON escaping") {
    import spark.implicits._
    val dir = tmpDir()
    val docs = Seq((0L, "plain text"), (1L, "line one\nline two"),
      (2L, "unicode é中文 ok"), (3L, "")).toDF("id", "text")
    Ingest.writeJsonlZst(docs, dir, shards = 2)
    assert(new File(dir).listFiles().count(_.getName.endsWith(
      ".jsonl.zst")) === 2)
    val back = Ingest.jsonlFiles(spark, dir + "/*.jsonl.zst", schema,
      strict = true)
    assert(rowBag(back.select("id", "text")) === rowBag(docs))
    // idempotent overwrite: a second export leaves exactly 2 shards
    Ingest.writeJsonlZst(docs, dir, shards = 2)
    assert(new File(dir).listFiles().count(_.getName.endsWith(
      ".jsonl.zst")) === 2)
  }

  test("mixed directory: zstd, gzip and plain shards sniff per file") {
    val dir = tmpDir()
    def write(name: String, body: Array[Byte]): Unit =
      Files.write(new File(dir, name).toPath, body)
    val l1 = "{\"id\": 1, \"text\": \"from plain\"}\n"
    val l2 = "{\"id\": 2, \"text\": \"from gzip\"}\n"
    write("a.jsonl", l1.getBytes("UTF-8"))
    val gz = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz)
    g.write(l2.getBytes("UTF-8")); g.close()
    write("b.jsonl.gz", gz.toByteArray)
    write("c.jsonl.zst", com.github.luben.zstd.Zstd.compress(
      "{\"id\": 3, \"text\": \"from zstd\"}\n".getBytes("UTF-8")))
    val back = Ingest.jsonlFiles(spark, dir + "/*", schema)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("text")).toMap
    assert(back === Map(1L -> "from plain", 2L -> "from gzip",
      3L -> "from zstd"))
  }

  test("corrupt lines: monitoring mode surfaces null rows with the " +
      "source file; strict mode fails naming file and line") {
    val dir = tmpDir()
    Files.write(new File(dir, "bad.jsonl").toPath,
      ("{\"id\": 1, \"text\": \"fine\"}\nNOT JSON AT ALL\n" +
        "{\"id\": 2, \"text\": \"also fine\"}\n").getBytes("UTF-8"))
    val lax = Ingest.jsonlFiles(spark, dir + "/*.jsonl", schema)
    assert(lax.count() === 3)
    val nulls = lax.filter(col("id").isNull && col("text").isNull)
    assert(nulls.count() === 1)
    assert(nulls.collect()(0).getAs[String]("_input_file")
      .endsWith("bad.jsonl"))
    val err = intercept[Exception] {
      Ingest.jsonlFiles(spark, dir + "/*.jsonl", schema, strict = true)
        .count()
    }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("unparsable JSONL") || msg.contains("NOT JSON"),
      s"strict error should name the line: $err")
  }
}
