package graft.store

import java.nio.file.{Files, Paths, NoSuchFileException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem abstraction for the snapshot manifest/lock layer.
  *
  * The parquet DATA in a snapshot always goes through Spark's Hadoop
  * FileSystem and works on any scheme; the small-file control plane
  * (manifests, the version-dir reservation, the pointer flip, GC
  * sweeps) is what this trait routes. Three implementations:
  *
  *   - [[NioSnapshotIO]] for plain local paths (no URI scheme): the
  *     original java.nio protocol — OS `FileChannel` lock on the flip,
  *     `ATOMIC_MOVE` renames, atomic `createDirectory` reservation.
  *   - [[HadoopSnapshotIO]] for scheme-qualified paths (`file:`,
  *     `hdfs:`, `viewfs:`): Hadoop `FileSystem`/`FileContext`. The
  *     reservation uses atomic `createNewFile` (NameNode-atomic on
  *     HDFS), the flip uses `FileContext.rename(OVERWRITE)` (atomic on
  *     HDFS and local), and the cross-process flip lock is an
  *     exclusive-create lease file with mtime-based expiry (HDFS has
  *     no byte-range locks; a crashed holder's lease is stolen after
  *     [[HadoopSnapshotIO.LockExpiryMs]]).
  *   - [[ObjectStoreSnapshotIO]] (`mem:`; see ObjectStoreIO.scala) for
  *     stores with NO rename at all: the same protocol re-expressed
  *     over conditional puts — put-if-absent reservation, single-PUT
  *     pointer flip (whole-object replace is atomic), CAS lease with
  *     put-if-match steal and delete-if-match release. In-sandbox it
  *     binds only to the in-memory double; a production S3/GCS/Azure
  *     binding supplies the same five primitives via the store's
  *     conditional-write API.
  *
  * Object-store schemes WITHOUT a conditional-write client binding in
  * this build (s3a, gs, abfs, …) are rejected loudly at selection
  * time: their rename is non-atomic, so the rename protocol cannot run
  * there (the same reason Delta Lake needs a LogStore / commit
  * coordinator on S3), and failing at `commit()` beats publishing a
  * torn pointer. Reference analog: the reference persists snapshots on
  * a single local filesystem only (src/storage/storage.cpp:401-444);
  * this layer is what takes the same contract to a cluster store.
  */
/** Handle passed to the pointer-lock critical section. [[stillHeld]] is
  * the FENCING PROBE the pointer flip calls immediately before
  * publishing: on the Hadoop lease lock a holder paused past the lease
  * expiry (long GC, VM freeze, skewed clock) can be displaced by
  * another committer's expiry steal — after which two processes are
  * inside the critical section. The displaced holder cannot be stopped
  * from COMPUTING, but it can be stopped from PUBLISHING: a flip that
  * verifies `stillHeld()` right before its pointer rename refuses to
  * publish over the thief's. The check-then-rename gap is a residual
  * TOCTOU, but it is microseconds against a 60 s expiry — a
  * double-publish now needs a steal to land inside exactly that gap,
  * versus the unguarded protocol where any >expiry pause sufficed.
  * (True fencing would need the token IN the pointer rename itself,
  * which filesystem renames cannot express — the object-store
  * conditional-put backend is where that becomes possible.) */
private[store] trait PointerLock {
  def stillHeld(): Boolean
}

private[store] trait SnapshotIO {
  /** Read a small control file fully; throws
    * [[java.nio.file.NoSuchFileException]] when missing (both impls
    * normalize to this so GC's Orphan-vs-Unreadable classification is
    * impl-independent). */
  def readString(p: String): String
  /** Stage `content` to `tmp` then atomically rename onto `target`
    * (overwrite). The rename is the single visibility point. */
  def writeStringAtomic(target: String, tmp: String, content: String): Unit
  def exists(p: String): Boolean
  def mkdirs(p: String): Unit
  /** Atomically reserve version-dir `p`; true exactly once per name
    * across processes. */
  def reserveVersionDir(p: String): Boolean
  /** Snapshot version numbers present under `root` (committed or not). */
  def listVersions(root: String): Array[Int]
  def deleteRecursive(p: String): Unit
  /** Cross-process + cross-thread mutual exclusion for the pointer
    * read-compare-rename critical section. The body receives a
    * [[PointerLock]] whose `stillHeld()` the flip must probe before
    * publishing (see the trait doc for what that fences). */
  def withPointerLock[T](root: String)(body: PointerLock => T): T

  /** Read the current pointer (None when absent) plus an opaque
    * observation token for [[publishPointer]]'s conditional write.
    * Filesystem backends return a dummy token — the pointer lock is
    * what serializes their read-compare-write. */
  def observePointer(p: String): (Option[String], AnyRef) =
    (try Some(readString(p))
     catch { case _: NoSuchFileException => None },
      SnapshotIO.NoObservation)

  /** Publish the pointer that [[observePointer]] observed. Filesystem
    * backends: one atomic staged-rename replace, always true (the
    * pointer lock already serializes). Object-store backends OVERRIDE
    * with a conditional put on the observed generation — TRUE fencing:
    * if anything (a lease steal during a long pause, however unlikely)
    * changed the pointer between observe and publish, the conditional
    * write LOSES (returns false) instead of silently regressing the
    * pointer. The caller treats false as the same retryable
    * displaced-holder abort the stillHeld() probe throws. */
  def publishPointer(p: String, tmp: String, content: String,
                     obs: AnyRef): Boolean = {
    writeStringAtomic(p, tmp, content); true
  }
  /** Canonical form of `root` for pin/monitor keying. */
  def canonical(root: String): String

  /** True when this backend cannot guarantee [[writeStringAtomic]]'s
    * parent-exists check — object stores have no parent constraint, so
    * the check is a best-effort LIST-then-PUT at most, and a committer
    * paused across a GC sweep can RESURRECT a lone manifest key into
    * the swept version dir. GC uses this to classify a parseable
    * manifest whose referenced data is gone as a sweepable Orphan on
    * such backends (and to fail closed everywhere else, where a missing
    * data dir can only mean corruption or a lying `exists`). */
  def manifestsResurrectable: Boolean = false
}

private[store] object SnapshotIO {
  /** Dummy observation token for backends whose publish needs none. */
  private[store] object NoObservation

  /** Schemes whose `rename` is atomic — the commit protocol's one hard
    * requirement. Everything else with a scheme is an object store (or
    * unknown) and is rejected. */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs")

  private def schemeOf(path: String): Option[String] =
    // a ':' before any '/' is a URI scheme; plain absolute/relative
    // local paths have none
    path.indexOf(':') match {
      case -1 => None
      case i if path.indexOf('/') != -1 && path.indexOf('/') < i => None
      case i => Some(path.substring(0, i).toLowerCase)
    }

  def forPath(path: String): SnapshotIO = schemeOf(path) match {
    case None => NioSnapshotIO
    case Some(s) if AtomicRenameSchemes(s) => new HadoopSnapshotIO()
    // mem: = the conditional-put protocol over the in-memory object
    // store (ObjectStoreIO.scala) — the seam a production S3/GCS/Azure
    // binding plugs into (those stores' conditional writes supply the
    // same primitives; only the five Bucket ops need a client).
    case Some("mem") => new ObjectStoreSnapshotIO()
    case Some(s) =>
      throw new IllegalArgumentException(
        s"snapshot root '$path': scheme '$s' has no atomic rename — the " +
          "rename-based commit protocol (atomic pointer flip, exclusive " +
          "version reservation) cannot run directly against an object " +
          "store, and no conditional-write client binding for this " +
          "scheme ships in this build. The conditional-put protocol " +
          "itself exists (graft.store.ObjectStoreSnapshotIO — proven on " +
          "the mem: double; binding it needs the store's conditional " +
          "PUT/DELETE, e.g. S3 If-None-Match/If-Match). Until a binding " +
          "exists: commit to HDFS (or a file: path) and copy/distcp the " +
          "result, or front the store with a commit-coordination service.")
  }
}

/** Plain-local-path implementation: the original java.nio protocol. */
private[store] object NioSnapshotIO extends SnapshotIO {
  def readString(p: String): String = Files.readString(Paths.get(p))

  def writeStringAtomic(target: String, tmp: String,
                        content: String): Unit = {
    val t = Paths.get(tmp)
    Files.writeString(t, content)
    Files.move(t, Paths.get(target),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def exists(p: String): Boolean = Files.exists(Paths.get(p))

  def mkdirs(p: String): Unit = { Files.createDirectories(Paths.get(p)); () }

  def reserveVersionDir(p: String): Boolean =
    try { Files.createDirectory(Paths.get(p)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  def listVersions(root: String): Array[Int] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toInt)

  def deleteRecursive(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array()).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(p))
  }

  def withPointerLock[T](root: String)(body: PointerLock => T): T = {
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(s"$root/.manifest.lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val fl = ch.lock()
    // an OS FileChannel lock cannot be stolen — the kernel releases it
    // only when the holder exits, so holding implies stillHeld
    try body(NioSnapshotIO.OsLockHeld)
    finally { fl.release(); ch.close() }
  }

  private[store] object OsLockHeld extends PointerLock {
    def stillHeld(): Boolean = true
  }

  def canonical(root: String): String =
    new java.io.File(root).getCanonicalPath
}

/** Hadoop `FileSystem`-backed implementation for cluster stores. A
  * fresh instance per operation keeps no FS handle cached across a
  * `FileSystem.closeAll` elsewhere; `FileSystem.get` itself caches. */
private[store] final class HadoopSnapshotIO extends SnapshotIO {
  import HadoopSnapshotIO.LockExpiryMs

  private def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fs(p: String): FileSystem =
    new HPath(p).getFileSystem(conf)

  def readString(p: String): String = {
    val f = fs(p)
    val in =
      try f.open(new HPath(p))
      catch {
        case e: java.io.FileNotFoundException =>
          // normalize: GC + restore classify "missing" by this type
          throw new NoSuchFileException(p).initCause(e)
            .asInstanceOf[NoSuchFileException]
      }
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeStringAtomic(target: String, tmp: String,
                        content: String): Unit = {
    val f = fs(target)
    // Hadoop create() mkdirs missing parents, which would silently
    // RESURRECT a version dir a concurrent GC just swept and publish a
    // manifest whose data dirs are gone. Check the parent first and
    // surface the sweep as the same NoSuchFileException the nio impl
    // throws (commit translates it into the sanctioned retryable abort).
    val parent = new HPath(target).getParent
    if (parent != null && !f.exists(parent))
      throw new NoSuchFileException(parent.toString)
    val out = f.create(new HPath(tmp), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext.rename(OVERWRITE): atomic on HDFS and local; this is
    // the protocol step the scheme whitelist exists for.
    FileContext.getFileContext(new HPath(target).toUri, conf)
      .rename(new HPath(tmp), new HPath(target), Options.Rename.OVERWRITE)
  }

  def exists(p: String): Boolean = fs(p).exists(new HPath(p))

  def mkdirs(p: String): Unit = { fs(p).mkdirs(new HPath(p)); () }

  def reserveVersionDir(p: String): Boolean = {
    // mkdirs is idempotent (no exclusivity), so the atom is an
    // exclusive-create marker FILE inside the dir: createNewFile is
    // NameNode-atomic on HDFS. Both racers may mkdirs the same dir;
    // exactly one wins the marker, the loser probes the next number.
    val f = fs(p)
    f.mkdirs(new HPath(p))
    f.createNewFile(new HPath(s"$p/.reserved"))
  }

  def listVersions(root: String): Array[Int] =
    try fs(root).listStatus(new HPath(root))
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toInt)
    catch { case _: java.io.FileNotFoundException => Array.empty[Int] }

  def deleteRecursive(p: String): Unit = {
    fs(p).delete(new HPath(p), true); ()
  }

  def withPointerLock[T](root: String)(body: PointerLock => T): T = {
    // Lease lock for the pointer-flip critical section. Every
    // state-changing step is an ATOMIC RENAME, because that is the one
    // primitive this impl's scheme whitelist guarantees:
    //
    //  - ACQUIRE: write a holder-unique lease file (UUID content) to a
    //    holder-unique tmp name, then rename it onto the lease path
    //    WITHOUT overwrite — succeeds for exactly one contender. (A
    //    plain createNewFile is NOT atomic on RawLocalFileSystem —
    //    create + chmod — and a concurrent stealer's rename mid-call
    //    makes it throw; LeaseLockSpec's two-stealer case caught this.)
    //  - STEAL (crashed holder): once the lease mtime is older than the
    //    expiry (re-read immediately before acting), rename it to a
    //    stealer-unique tombstone, then RE-VERIFY staleness on the
    //    tombstone (mtime travels with the rename). A fresh capture —
    //    another stealer completed its whole steal-and-reacquire cycle
    //    between this stealer's staleness read and its rename — is
    //    restored via [[restoreDisplacedLease]] (atomic, NEVER
    //    overwriting: a third contender that grabbed the momentarily
    //    vacant path keeps its live lease) and this caller falls
    //    through to ordinary waiting. Clock skew between clients eats
    //    into the expiry margin — it is deliberately much longer than
    //    any flip — and the residual displaced-holder window is fenced
    //    by the PointerLock.stillHeld() probe the flip runs before
    //    publishing.
    //  - RELEASE: delete only if the lease content is still OUR uuid —
    //    after an expiry steal the path may hold someone else's lease.
    //
    // The JVM monitor in GraphStore.commit already serializes threads
    // of this process; this protocol is for crossing processes.
    val f = fs(root)
    val me = java.util.UUID.randomUUID().toString
    val expiryMs = LockExpiryMs
    val lock = new HPath(s"$root/.manifest.flip.lease")
    val fc = FileContext.getFileContext(lock.toUri, conf)
    def leaseContent(p: HPath): Option[String] =
      try {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    val deadline = System.nanoTime() + expiryMs * 2L * 1000000L
    // The acquire atom is scheme-appropriate: HDFS/viewfs rename (and
    // create) are NameNode-atomic, so tmp + rename-without-overwrite is
    // the exclusive atom there. On a local `file:` root neither Hadoop
    // createNewFile (create + chmod — two syscalls) nor a no-overwrite
    // FileContext.rename (exists-check + rename(2), which OVERWRITES) is
    // atomic — use java.nio CREATE_NEW, which maps to O_CREAT|O_EXCL.
    def tryAcquire(): Boolean =
      if ("file" == Option(lock.toUri.getScheme).orNull) {
        try {
          Files.write(Paths.get(lock.toUri),
            me.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else {
        val tmp = new HPath(s"$root/.manifest.flip.lease.tmp.$me")
        val out = f.create(tmp, true)
        try out.write(me.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        try { fc.rename(tmp, lock); true } // no-overwrite: atomic on HDFS
        catch {
          case _: java.io.IOException => f.delete(tmp, false); false
        }
      }
    var held = false
    while (!held) {
      held = tryAcquire()
      if (!held) {
        val stale =
          try System.currentTimeMillis() -
            f.getFileStatus(lock).getModificationTime > expiryMs
          catch { case _: java.io.FileNotFoundException => false }
        if (stale) {
          // Re-read the mtime IMMEDIATELY before the displacing rename:
          // the staleness read above may be arbitrarily old by the time
          // this branch runs (another stealer can complete a whole
          // steal-and-reacquire cycle in between, leaving a FRESH lease
          // at the path). This shrinks — cannot close — the TOCTOU; the
          // restore below and the stillHeld() fence bound the damage of
          // the residual window.
          val stillStale =
            try System.currentTimeMillis() -
              f.getFileStatus(lock).getModificationTime > expiryMs
            catch { case _: java.io.FileNotFoundException => false }
          if (stillStale) {
            val tomb = new HPath(s"$root/.manifest.flip.lease.stolen.$me")
            try {
              fc.rename(lock, tomb, Options.Rename.OVERWRITE)
              val capturedStale = System.currentTimeMillis() -
                f.getFileStatus(tomb).getModificationTime > expiryMs
              if (capturedStale) { f.delete(tomb, false); () }
              else restoreDisplacedLease(root, tomb)
            } catch { // another stealer's rename won; contend normally
              case _: java.io.FileNotFoundException => ()
            }
          }
          ()
        }
        else if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"pointer-flip lease at $lock held past expiry — crashed " +
              "holder with a future clock? Delete the lease to recover.")
        else Thread.sleep(20)
      }
    }
    val handle = new PointerLock {
      // fencing probe: our lease is ours only while it still carries our
      // uuid — after an expiry steal the path holds the thief's lease
      // (or nothing, mid-steal), and a displaced holder must not publish
      def stillHeld(): Boolean = leaseContent(lock).contains(me)
    }
    try body(handle) finally {
      if (leaseContent(lock).contains(me)) { f.delete(lock, false); () }
    }
  }

  /** Put a wrongly-displaced (captured-but-FRESH) lease back WITHOUT
    * ever overwriting: between the displacing rename and this restore
    * the lock path is vacant, and a third contender may have atomically
    * acquired it — an overwriting rename-back here would destroy that
    * live lease and put a second process inside the critical section
    * with no fence at all (the pre-r9 bug). The restore atom is
    * scheme-appropriate: on `file:` a hard link (link(2) fails-if-exists
    * atomically and preserves mtime — a no-overwrite FileContext.rename
    * is exists-check + rename(2), which overwrites); on HDFS/viewfs a
    * no-overwrite rename is NameNode-atomic. When the restore LOSES
    * (lock re-acquired meanwhile), the displaced holder's lease is
    * dropped with the tombstone: its release already no-ops on the uuid
    * mismatch, and its `stillHeld()` fence refuses the flip — so losing
    * the restore costs that holder a retryable abort, never a torn
    * publish. Returns true when the lease went back. */
  private[store] def restoreDisplacedLease(root: String,
                                           tomb: HPath): Boolean = {
    val f = fs(root)
    val lock = new HPath(s"$root/.manifest.flip.lease")
    val restored =
      if ("file" == Option(lock.toUri.getScheme).orNull) {
        try {
          Files.createLink(Paths.get(lock.toUri), Paths.get(tomb.toUri))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      } else {
        val fc = FileContext.getFileContext(lock.toUri, conf)
        try { fc.rename(tomb, lock); true } // no-overwrite: atomic on HDFS
        catch { case _: java.io.IOException => false }
      }
    // the link path leaves the tomb name behind on success, and a lost
    // restore leaves the captured lease in it — remove either way
    try { f.delete(tomb, false); () }
    catch { case _: java.io.IOException => () }
    restored
  }

  def canonical(root: String): String =
    fs(root).makeQualified(new HPath(root)).toString
}

private[store] object HadoopSnapshotIO {
  /** How long a pointer-flip lease may sit before another committer
    * declares its holder dead and steals it. */
  val LockExpiryMs = 60000L
}
