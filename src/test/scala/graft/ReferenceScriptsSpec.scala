package graft

import graft.ql.Shell
import graft.store.GraphStore

/** End-to-end QL parity: every TundraQL `.sql` script shipped with the
  * reference (under /root/reference/test_scripts/) must execute through
  * the shell with zero failed statements — parse (`--` comments,
  * RETURN id, WITH props, selectors, bare MATCH) and semantics both.
  */
class ReferenceScriptsSpec extends SparkSpec {

  private val scriptsDir = new java.io.File("/root/reference/test_scripts")

  private def scripts: Seq[java.io.File] =
    Option(scriptsDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName).toSeq

  test("every reference test script executes with zero failures") {
    assert(scripts.nonEmpty, s"no scripts found under $scriptsDir")
    val failures = scripts.flatMap { f =>
      // scripts COMMIT like the reference shell (which always has a db
      // path) — give each one a scratch snapshot dir
      val snap = java.nio.file.Files
        .createTempDirectory("graft-refscript").toString
      val sh = new Shell(new GraphStore(spark), Some(snap))
      try {
        val (ok, failed) = sh.executeScriptFile(f.getPath)
        if (failed > 0) Some(s"${f.getName}: $failed/${ok + failed} failed")
        else None
      } catch {
        case e: Exception => Some(s"${f.getName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
