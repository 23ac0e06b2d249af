package graft.store

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import org.scalatest.funsuite.AnyFunSuite

/** The conditional-put (CAS) pointer-lock protocol of
  * [[ObjectStoreSnapshotIO]] — the object-store analog of
  * LeaseLockSpec. The claims under test are exactly the ones the
  * rename-based lease cannot make:
  *
  *  - the expiry steal is ONE compare-and-swap, so there is no vacancy
  *    window in which a third contender's acquisition can be clobbered;
  *  - release is delete-if-generation-match, so a displaced holder
  *    cannot delete a thief's lease even by accident;
  *  - stillHeld() is the same fencing probe the commit flip runs on
  *    every backend.
  */
class ObjectStoreLeaseSpec extends AnyFunSuite {

  private var n = 0
  private def newRoot(): (String, MemObjectStore.Bucket) = {
    n += 1
    val name = s"leasespec$n"
    MemObjectStore.clear(name)
    (s"mem://$name/root", MemObjectStore.bucket(name))
  }
  private val Lease = "root/.manifest.flip.lease"
  private def io = new ObjectStoreSnapshotIO()

  test("a FRESH lease blocks withPointerLock until released") {
    val (root, bkt) = newRoot()
    bkt.put(Lease, "planted".getBytes("UTF-8"))
    val entered = new CountDownLatch(1)
    val t = new Thread(() => {
      io.withPointerLock(root) { _ => entered.countDown() }
    })
    t.setDaemon(true); t.start()
    assert(!entered.await(1500, TimeUnit.MILLISECONDS),
      "entered the critical section past a fresh (unexpired) lease")
    bkt.delete(Lease)
    assert(entered.await(10, TimeUnit.SECONDS),
      "never entered after the lease was released")
    t.join(10000)
  }

  test("a STALE lease is stolen with one CAS and cleaned up on release") {
    val (root, bkt) = newRoot()
    bkt.put(Lease, "planted".getBytes("UTF-8"))
    bkt.backdate(Lease, System.currentTimeMillis() -
      HadoopSnapshotIO.LockExpiryMs - 60000L)
    val entered = new AtomicInteger(0)
    io.withPointerLock(root) { _ => entered.incrementAndGet(); () }
    assert(entered.get() === 1)
    assert(bkt.get(Lease).isEmpty, "lease leaked after release")
  }

  test("N concurrent contenders against a STALE lease: exactly one CAS " +
      "wins each steal, the critical section is never entered " +
      "concurrently, and all eventually run") {
    val (root, bkt) = newRoot()
    bkt.put(Lease, "planted".getBytes("UTF-8"))
    bkt.backdate(Lease, System.currentTimeMillis() -
      HadoopSnapshotIO.LockExpiryMs - 60000L)
    val inside = new AtomicInteger(0)
    val maxInside = new AtomicInteger(0)
    val ran = new AtomicInteger(0)
    val err = new AtomicReference[Throwable](null)
    val start = new CountDownLatch(1)
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        try {
          start.await()
          io.withPointerLock(root) { _ =>
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            Thread.sleep(30)
            inside.decrementAndGet()
            ran.incrementAndGet()
            ()
          }
        } catch { case t: Throwable => err.compareAndSet(null, t); () }
      })
    }
    threads.foreach { t => t.setDaemon(true); t.start() }
    start.countDown()
    threads.foreach(_.join(30000))
    assert(err.get() == null, s"contender died: ${err.get()}")
    assert(ran.get() === 4, "a contender never entered the critical section")
    assert(maxInside.get() === 1,
      "mutual exclusion violated: two contenders inside at once")
    assert(bkt.get(Lease).isEmpty, "lease leaked after all released")
  }

  test("FENCING: a holder whose lease expires mid-section is displaced " +
      "by a CAS steal, observes stillHeld()=false, and its release " +
      "cannot delete the thief's lease (delete-if-match)") {
    val (root, bkt) = newRoot()
    val aInside = new CountDownLatch(1)
    val bHolds = new CountDownLatch(1)
    val bMayRelease = new CountDownLatch(1)
    val heldAtEntry = new AtomicReference[Option[Boolean]](None)
    val heldAfterSteal = new AtomicReference[Option[Boolean]](None)
    val err = new AtomicReference[Throwable](null)
    val a = new Thread(() => {
      try io.withPointerLock(root) { lk =>
        heldAtEntry.set(Some(lk.stillHeld()))
        // simulate a pause past the expiry: age our own lease
        bkt.backdate(Lease, System.currentTimeMillis() -
          HadoopSnapshotIO.LockExpiryMs - 60000L)
        aInside.countDown()
        assert(bHolds.await(20, TimeUnit.SECONDS), "thief never entered")
        heldAfterSteal.set(Some(lk.stillHeld()))
      } catch { case t: Throwable => err.compareAndSet(null, t); () }
    })
    val b = new Thread(() => {
      try {
        aInside.await()
        io.withPointerLock(root) { _ =>
          bHolds.countDown()
          bMayRelease.await()
        }
      } catch { case t: Throwable => err.compareAndSet(null, t); () }
    })
    a.setDaemon(true); b.setDaemon(true); a.start(); b.start()
    a.join(30000) // A releases while B holds: delete-if-match must no-op
    assert(err.get() == null, s"contender died: ${err.get()}")
    assert(bkt.get(Lease).isDefined,
      "displaced holder's release deleted the thief's live lease")
    bMayRelease.countDown()
    b.join(30000)
    assert(err.get() == null, s"contender died: ${err.get()}")
    assert(heldAtEntry.get() === Some(true))
    assert(heldAfterSteal.get() === Some(false),
      "a displaced holder observed stillHeld()=true — the fence would " +
        "have let it publish over the thief's flip")
    assert(bkt.get(Lease).isEmpty, "lease leaked after the thief released")
  }

  test("publishPointer is a CAS on the observed generation: a late " +
      "publish after ANY intervening write loses instead of regressing " +
      "the pointer (true fencing, independent of lease timing)") {
    val (root, _) = newRoot()
    io.mkdirs(root)
    val ptr = s"$root/manifest.json"
    // first publish goes through the absent-pointer (put-if-absent) path
    val (none, obsAbsent) = io.observePointer(ptr)
    assert(none.isEmpty)
    assert(io.publishPointer(ptr, "", """{"version":1}""", obsAbsent))
    // a stale holder observes v1 …
    val (c1, obs1) = io.observePointer(ptr)
    assert(c1.exists(_.contains("1")))
    // … then a thief (who stole its lease during a pause) publishes v2
    val (_, obs2) = io.observePointer(ptr)
    assert(io.publishPointer(ptr, "", """{"version":2}""", obs2))
    // the stale holder's late publish must LOSE — the store refuses it
    assert(!io.publishPointer(ptr, "", """{"version":1}""", obs1),
      "a publish conditioned on a stale observation went through")
    assert(io.readString(ptr) === """{"version":2}""")
    // and a second absent-conditioned publish loses too (pointer exists)
    assert(!io.publishPointer(ptr, "", """{"version":0}""", obsAbsent))
    assert(io.readString(ptr) === """{"version":2}""")
  }

  test("version-dir reservation is exactly-once across concurrent " +
      "reservers (put-if-absent)") {
    val (root, _) = newRoot()
    val wins = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        if (io.reserveVersionDir(s"$root/v7")) wins.incrementAndGet()
        ()
      })
    }
    threads.foreach { t => t.setDaemon(true); t.start() }
    start.countDown()
    threads.foreach(_.join(10000))
    assert(wins.get() === 1,
      s"reservation won ${wins.get()} times; must be exactly once")
  }

  test("pointer flip is one atomic PUT and readString round-trips; a " +
      "swept version dir surfaces as NoSuchFileException (Orphan class)") {
    val (root, _) = newRoot()
    assert(io.reserveVersionDir(s"$root/v1"))
    io.writeStringAtomic(s"$root/v1/manifest.json",
      s"$root/v1/.manifest.tmp", """{"version":1}""")
    assert(io.readString(s"$root/v1/manifest.json") === """{"version":1}""")
    assert(io.listVersions(root).toSeq === Seq(1))
    io.deleteRecursive(s"$root/v1")
    // after the sweep the dir has no keys: reads classify Orphan-style
    intercept[java.nio.file.NoSuchFileException] {
      io.readString(s"$root/v1/manifest.json")
    }
    // and a late manifest write cannot resurrect the swept dir
    intercept[java.nio.file.NoSuchFileException] {
      io.writeStringAtomic(s"$root/v1/manifest.json",
        s"$root/v1/.manifest.tmp", """{"version":1}""")
    }
  }
}
