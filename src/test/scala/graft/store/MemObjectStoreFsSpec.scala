package graft.store

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** Hadoop-contract fidelity gates for [[MemObjectStoreFileSystem]] — the
  * double must not be MORE permissive than the stores it models (HDFS /
  * S3A), or it silently masks data-plane committer bugs (r9 ADVICE).
  */
class MemObjectStoreFsSpec extends AnyFunSuite {

  private def freshFs(bucket: String): MemObjectStoreFileSystem = {
    MemObjectStore.clear(bucket)
    val fs = new MemObjectStoreFileSystem
    fs.initialize(URI.create(s"mem://$bucket/"), new Configuration())
    fs
  }

  private def write(fs: MemObjectStoreFileSystem, p: String,
                    s: String): Unit = {
    val out = fs.create(new HPath(p), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  test("rename onto an existing FILE fails (HDFS/S3A contract), " +
      "leaving both files untouched") {
    val fs = freshFs("fscontract")
    write(fs, "mem://fscontract/a", "src-bytes")
    write(fs, "mem://fscontract/b", "dst-bytes")
    assert(!fs.rename(new HPath("mem://fscontract/a"),
      new HPath("mem://fscontract/b")))
    val bkt = MemObjectStore.bucket("fscontract")
    assert(new String(bkt.get("a").get.bytes, "UTF-8") === "src-bytes")
    assert(new String(bkt.get("b").get.bytes, "UTF-8") === "dst-bytes")
  }

  test("rename into an existing DIRECTORY moves the source under it, " +
      "but fails if that slot is already a file") {
    val fs = freshFs("fsdir")
    write(fs, "mem://fsdir/src", "payload")
    fs.mkdirs(new HPath("mem://fsdir/d"))
    assert(fs.rename(new HPath("mem://fsdir/src"),
      new HPath("mem://fsdir/d")))
    val bkt = MemObjectStore.bucket("fsdir")
    assert(bkt.get("d/src").isDefined && bkt.get("src").isEmpty)
    // a second file renamed to the same occupied slot must fail
    write(fs, "mem://fsdir/src", "other")
    assert(!fs.rename(new HPath("mem://fsdir/src"),
      new HPath("mem://fsdir/d")))
    assert(new String(bkt.get("d/src").get.bytes, "UTF-8") === "payload")
  }

  test("double-close PUTs exactly once: no new generation for an " +
      "etag-conditioned observer to spuriously lose against") {
    val fs = freshFs("fsclose")
    val out = fs.create(new HPath("mem://fsclose/k"), true)
    out.write("bytes".getBytes("UTF-8"))
    out.close()
    val bkt = MemObjectStore.bucket("fsclose")
    val etag = bkt.get("k").get.etag
    out.close() // Hadoop stream wrappers commonly double-close
    assert(bkt.get("k").get.etag === etag,
      "second close minted a new generation")
    // an etag-conditioned CAS taken before the double-close still wins
    assert(bkt.putIfMatch("k", "swapped".getBytes("UTF-8"), etag).isDefined)
  }
}
