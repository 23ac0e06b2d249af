package graft.pipeline

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus ingestion for the formats web-scale text corpora actually
  * ship in: `.jsonl`, `.jsonl.zst`, `.jsonl.gz` shards (the
  * RedPajama / Dolma / CommonCrawl-derivative convention — one JSON
  * object per line, zstd- or gzip-compressed per shard file).
  *
  * 100 TB shape: `spark.read.format("binaryFile")` makes one task per
  * shard file — exactly the parallel grain these corpora are sharded
  * for (the 100-500 MB shard convention) — and the decompressor is
  * STREAMING (`ZstdInputStream`/`GZIPInputStream` feeding a line
  * reader), so a task holds one compressed shard plus one line in
  * memory, never the decompressed file. Compression is sniffed per
  * file from magic bytes, so mixed directories work. JSON parsing is
  * `from_json` against the caller's schema — codegen'd, with
  * `_corrupt`-style null rows surfaced rather than dropped (an ingest
  * pipeline must SEE parse failures; the `strict` flag turns them into
  * loud task failures instead). Note Spark's `binaryFile` source caps
  * single files at 2 GB — shard upstream, as every published corpus
  * already does.
  *
  * The reference has no file-ingestion surface beyond CSV
  * (bench/tundra_runner.cpp:15-27) — this is beyond-parity, SURVEY
  * §2.10.
  */
object Ingest {

  private def sniffStream(bytes: Array[Byte]): InputStream = {
    val raw = new java.io.ByteArrayInputStream(bytes)
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x28 &&
      (bytes(1) & 0xFF) == 0xB5 && (bytes(2) & 0xFF) == 0x2F &&
      (bytes(3) & 0xFF) == 0xFD) new ZstdInputStream(raw)
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F &&
      (bytes(1) & 0xFF) == 0x8B) new GZIPInputStream(raw)
    else raw
  }

  /** Read a glob of `.jsonl[.zst|.gz]` shards into rows of `schema`.
    * Output carries the source file path as `_input_file` plus the
    * schema's fields. With `strict = false` (default) an unparsable
    * line yields a row of nulls for the schema fields (count them to
    * monitor corpus health); with `strict = true` it fails the task
    * naming the file. */
  def jsonlFiles(spark: SparkSession, glob: String, schema: StructType,
                 strict: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // The zstd reader holds a NATIVE context, so it must close on
        // every task exit path — not just full drain: a downstream
        // limit/take or a strict-mode raise_error abandons the
        // iterator mid-file and would leak native memory per shard in
        // long-lived executors (advice r13). Files are read
        // sequentially, so one "currently open" slot plus a
        // task-completion listener covers early aborts; the drain path
        // still closes promptly.
        val open = new java.util.concurrent.atomic
          .AtomicReference[BufferedReader]()
        def closeOpen(): Unit =
          Option(open.getAndSet(null)).foreach(_.close())
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOpen()))
        it.flatMap { case (path, bytes) =>
          closeOpen() // previous file's reader, if not fully drained
          val reader = new BufferedReader(new InputStreamReader(
            sniffStream(bytes), "UTF-8"))
          open.set(reader)
          Iterator.continually(reader.readLine()).takeWhile { l =>
            if (l == null) closeOpen()
            l != null
          }.filter(_.nonEmpty).map(l => (path, l))
        }
      }.toDF("_input_file", "_line")
    val parsed = lines.select(col("_input_file"),
      from_json(col("_line"), schema).as("_r"), col("_line"))
    val bad = col("_r").isNull ||
      schema.fields.map(f => col("_r")(f.name).isNull)
        .reduce(_ && _) // from_json nulls every field on corrupt input
    val checked =
      if (!strict) parsed
      else parsed.filter(when(bad, raise_error(concat(
        lit("unparsable JSONL line in "), col("_input_file"),
        lit(": "), substring(col("_line"), 1, 120))))
        .otherwise(lit(true)))
    checked.select(col("_input_file") +: schema.fields.toSeq
      .map(f => col("_r")(f.name).as(f.name)): _*)
  }

  /** Read a glob of WARC shards (`.warc` / `.warc.gz` — the format
    * CommonCrawl actually ships, ISO 28500) into one row per record:
    * `(_input_file, warc_type, target_uri, payload)`. The parse is
    * BYTE-exact: headers are read line-wise up to the blank line, the
    * body is read as exactly `Content-Length` bytes (so payloads may
    * contain any byte sequence, including CRLFs and multi-byte UTF-8),
    * then the record's trailing CRLFCRLF is consumed. Malformed
    * records end that FILE's parse (remaining well-formed files are
    * unaffected) — a torn shard yields its prefix, the standard
    * salvage behavior for crawl data.
    *
    * 100 TB shape: identical to [[jsonlFiles]] — one task per shard
    * via `binaryFile` (CommonCrawl's ~1 GB .warc.gz grain), streaming
    * gzip decompress (multi-member streams supported, as CC writes
    * them), one record in memory at a time. The 2 GB/file binaryFile
    * cap is upstream sharding's job, as with JSONL. */
  def warcFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // same native-resource discipline as jsonlFiles: gzip's
        // Inflater (and zstd's context) hold native memory — close on
        // every task exit path, including early abandonment
        val open = new java.util.concurrent.atomic
          .AtomicReference[java.io.InputStream]()
        def closeOpen(): Unit =
          Option(open.getAndSet(null)).foreach(_.close())
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOpen()))
        it.flatMap { case (path, bytes) =>
          closeOpen()
          val in = new java.io.BufferedInputStream(sniffStream(bytes))
          open.set(in)
          // byte-wise header-line reader: WARC headers are ASCII,
          // CRLF-terminated; never a Reader here — the body length is
          // in BYTES and a Reader would desynchronize the stream
          def readLine(): String = {
            val sb = new java.lang.StringBuilder(64)
            var c = in.read()
            while (c != -1 && c != '\n') {
              if (c != '\r') sb.append(c.toChar)
              c = in.read()
            }
            if (c == -1 && sb.length == 0) null else sb.toString
          }
          // Never PREALLOCATE from the untrusted Content-Length header
          // (the Flac STREAMINFO lesson): a crafted/torn record
          // claiming 2^31-1 bytes would allocate 2 GB before the first
          // read. Grow with the bytes that actually arrive — a torn
          // stream then costs only what it contained.
          def readFully(n: Int): Array[Byte] = {
            val out = new java.io.ByteArrayOutputStream(
              math.min(n, 1 << 16))
            val buf = new Array[Byte](1 << 16)
            var remaining = n
            while (remaining > 0) {
              val k = in.read(buf, 0, math.min(buf.length, remaining))
              if (k < 0) throw new java.io.EOFException("torn record")
              out.write(buf, 0, k)
              remaining -= k
            }
            out.toByteArray
          }
          Iterator.continually {
            try {
              val version = readLine()
              if (version == null || !version.startsWith("WARC/")) None
              else {
                var warcType = ""
                var uri = ""
                var len = -1L
                var line = readLine()
                while (line != null && line.nonEmpty) {
                  val i = line.indexOf(':')
                  if (i > 0) {
                    val k = line.substring(0, i).trim.toLowerCase
                    val v = line.substring(i + 1).trim
                    k match {
                      case "warc-type"       => warcType = v
                      case "warc-target-uri" => uri = v
                      case "content-length"  => len = v.toLong
                      case _                 => ()
                    }
                  }
                  line = readLine()
                }
                if (len < 0 || len > Int.MaxValue) None
                else {
                  val body = readFully(len.toInt)
                  readLine(); readLine() // record-terminating CRLFCRLF
                  Some((path, warcType, uri, body))
                }
              }
            } catch {
              case _: java.io.IOException | _: NumberFormatException =>
                None // torn/malformed: salvage the records parsed so far
            }
          }.takeWhile { r => if (r.isEmpty) closeOpen(); r.nonEmpty }
            .flatten
        }
      }.toDF("_input_file", "warc_type", "target_uri", "payload")
  }

  /** Write `(id, text, source)`-shaped rows as gzipped WARC response
    * records (the fixture / export twin of [[warcFiles]]): `shards`
    * files named `part-NNNNN.warc.gz` under `dir`. The target URI
    * encodes source and id (`http://<source>/<id>`); the body is the
    * UTF-8 text. Executors write their own shards — no driver
    * funnel. */
  def writeWarcGz(df: DataFrame, dir: String, shards: Int): Unit = {
    require(shards >= 1, "shards must be >= 1")
    require(df.columns.length == 3,
      s"expected (id, text, source) columns, got ${df.columns.toSeq}")
    val Seq(idC, textC, srcC) = df.columns.toSeq
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(idC).cast("long"), coalesce(col(textC), lit(""))
        .cast("string"), col(srcC).cast("string"))
      .repartition(shards).rdd.foreachPartition { it =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(
          f"$dir%s/part-$part%05d.warc.gz")
        val fs = path.getFileSystem(conf.value)
        val out = new GZIPOutputStream(fs.create(path, true))
        try {
          val crlf = "\r\n".getBytes("US-ASCII")
          it.foreach { r =>
            val body = r.getString(1).getBytes("UTF-8")
            val hdr = ("WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Target-URI: http://${r.getString(2)}/${r.getLong(0)}\r\n" +
              "Content-Type: text/plain\r\n" +
              s"Content-Length: ${body.length}\r\n" +
              "\r\n").getBytes("US-ASCII")
            out.write(hdr); out.write(body)
            out.write(crlf); out.write(crlf)
          }
        } finally out.close()
      }
  }

  /** Write a DataFrame as zstd-compressed JSONL shards (the fixture /
    * export twin of [[jsonlFiles]]): `shards` files named
    * `part-NNNNN.jsonl.zst` under `dir`, written through the Hadoop
    * FileSystem API so local paths and `hdfs:`/object-store URIs both
    * work. Executors write their own shards — no driver funnel. */
  def writeJsonlZst(df: DataFrame, dir: String, shards: Int): Unit = {
    require(shards >= 1, "shards must be >= 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.toJSON.repartition(shards).rdd.foreachPartition { it =>
      // one file per partition; TaskContext gives the shard ordinal
      val part = org.apache.spark.TaskContext.getPartitionId()
      val path = new org.apache.hadoop.fs.Path(
        f"$dir%s/part-$part%05d.jsonl.zst")
      val fs = path.getFileSystem(conf.value)
      val out = new ZstdOutputStream(fs.create(path, true))
      try {
        val nl = "\n".getBytes("UTF-8")
        it.foreach { line =>
          out.write(line.getBytes("UTF-8")); out.write(nl)
        }
      } finally out.close()
    }
  }
}
