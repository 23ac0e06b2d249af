package graft.ql

import java.io.{BufferedReader, InputStreamReader, PrintStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.GraphStore

/** Interactive REPL over [[Shell]] — the analog of the reference's
  * linenoise shell loop (apps/tundra_shell.cpp:1900+: prompt, history,
  * dot-commands, per-statement error reporting). Statements accumulate
  * across lines until a terminating `;`, then run as a script (so
  * multi-statement pastes work); results print as a bounded table.
  *
  * Dot commands (the reference's shell builtins, minus linenoise-only
  * keybinding ones):
  *   .help              command list
  *   .run <file>        execute a TundraQL script file (reference --script)
  *   .history           this session's executed inputs
  *   .quit / .exit      leave
  *
  * `runMain graft.ql.ShellMain [snapshotPath]` — with a path, the store
  * restores from that committed snapshot first.
  *
  * The loop is pure over (reader, printer) so ShellSpec can drive a full
  * session transcript without a TTY.
  */
object ShellMain {

  /** Render a bounded, aligned preview (driver-side `take(21)` only —
    * an interactive surface, never a data-plane path). */
  private[ql] def render(df: DataFrame, out: PrintStream,
                         maxRows: Int = 20): Unit = {
    val cols = df.columns
    val rows = df.take(maxRows + 1)
    val shown = rows.take(maxRows).map(_.toSeq.map {
      case null => "NULL"
      case v => v.toString
    })
    val widths = cols.indices.map(i =>
      (cols(i).length +: shown.map(_(i).length)).max)
    def line(vals: Seq[String]) = out.println(
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |"))
    line(cols.toSeq)
    line(widths.map("-" * _))
    shown.foreach(line)
    if (rows.length > maxRows)
      out.println(s"... (showing first $maxRows rows)")
    else out.println(s"${shown.length} row(s)")
  }

  /** Read-eval-print until EOF or .quit. Returns executed-input count. */
  def runRepl(shell: Shell, in: BufferedReader, out: PrintStream): Int = {
    val history = scala.collection.mutable.ArrayBuffer[String]()
    val pending = new StringBuilder
    var done = false
    while (!done) {
      out.print(if (pending.isEmpty) "graft> " else "   ...> ")
      out.flush()
      val line = in.readLine()
      if (line == null) done = true
      else {
        val trimmed = line.trim
        trimmed match {
          case "" => // skip blanks
          case ".quit" | ".exit" => done = true
          case ".help" =>
            out.println(".run <file> | .history | .quit — statements end with ;")
          case ".history" =>
            history.zipWithIndex.foreach { case (h, i) =>
              out.println(s"${i + 1}  $h") }
          case cmd if cmd.startsWith(".run ") =>
            val path = cmd.stripPrefix(".run ").trim
            try {
              val (ok, failed) = shell.executeScriptFile(path)
              out.println(s"script: $ok executed, $failed failed")
              history += cmd
            } catch {
              case e: Exception => out.println(s"error: ${e.getMessage}")
            }
          case _ =>
            pending.append(line).append('\n')
            if (trimmed.endsWith(";")) {
              val stmt = pending.toString
              pending.clear()
              try {
                shell.execute(stmt) match {
                  case Some(df) => render(df, out)
                  case None => out.println("ok")
                }
                history += stmt.trim
              } catch {
                case e: Exception => out.println(s"error: ${e.getMessage}")
              }
            }
        }
      }
    }
    history.length
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-shell")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A path that is not (yet) a snapshot starts a fresh store whose
    // first COMMIT will create it — so `ShellMain /some/new/dir` is a
    // valid way to begin a persisted session, not an error.
    val store = args.headOption match {
      case Some(path)
          if java.nio.file.Files.exists(java.nio.file.Paths.get(path)) =>
        GraphStore.restore(spark, path)
      case Some(path) =>
        println(s"(new store — COMMIT will write its first snapshot to $path)")
        new GraphStore(spark)
      case None => new GraphStore(spark)
    }
    val shell = new Shell(store, snapshotPath = args.headOption)
    println("graft shell — .help for commands, .quit to leave")
    runRepl(shell,
      new BufferedReader(new InputStreamReader(System.in)), System.out)
    spark.stop()
  }
}
