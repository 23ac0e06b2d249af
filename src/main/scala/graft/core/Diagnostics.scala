package graft.core

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Driver-side warnings fed by executor-side accumulators, checked at
  * job boundaries — operator observability with NO dedicated action.
  *
  * The alternative (an eager `count()` of the diagnostic condition)
  * costs one full job dispatch per operator call on the latency path:
  * measured ~70-100 ms per simhashPairs call at sf0.1, a 15% tax on
  * that query for a counter that is zero on every healthy corpus. Here
  * the condition is counted into a [[LongAccumulator]] by whatever job
  * first computes the (already plan-broken) materialization pass, and a
  * single per-context listener fires each registered warning at most
  * once, from the driver, the first time its accumulator goes nonzero.
  *
  * Semantics at scale: task retries can double-count (the standard
  * Spark accumulator caveat) — acceptable for a warning whose payload
  * is "nonzero means degraded", and the count is reported as observed.
  * If the caller never runs an action over the operator's output, the
  * pass never computes and no warning fires — nothing happened, so
  * there is nothing to observe.
  */
object Diagnostics {

  /** One registration: the fed accumulator, the warn callback, and an
    * at-most-once claim flag. The flag — not queue-iterator `remove()`,
    * whose success is unobservable — is what makes the warn fire exactly
    * once even when the async listener bus and [[drainNow]] (or two
    * listeners) drain concurrently (r9 ADVICE). */
  private final class Entry(val acc: LongAccumulator,
                            val warn: Long => Unit) {
    val fired = new AtomicBoolean(false)
  }

  private val pending = new ConcurrentLinkedQueue[Entry]()
  // all applicationIds that already have a listener — a plain last-one
  // slot flip-flops when two live contexts alternate registrations and
  // installs duplicates (r9 ADVICE). Bounded by contexts-per-JVM.
  private val installed = ConcurrentHashMap.newKeySet[String]()

  /** Register `warn` to fire once, driver-side, the first time `acc`
    * is observed nonzero at a job boundary. Returns the accumulator to
    * feed from the plan (e.g. a pass-through map at a materialization
    * boundary). Zero-valued registrations are retained (their condition
    * may still trip later) but bounded: the queue is capped, oldest
    * dropped first, so a driver looping an operator forever cannot
    * accrete unbounded diagnostic state.
    */
  def warnOnNonZero(spark: SparkSession, name: String)
                   (warn: Long => Unit): LongAccumulator = {
    val sc = spark.sparkContext
    val acc = sc.longAccumulator(name)
    pending.add(new Entry(acc, warn))
    while (pending.size > 1024) pending.poll()
    // one listener per SparkContext (keyed by applicationId — a fresh
    // local context in tests gets its own); entries from a previous
    // context stay zero and age out of the bounded queue
    if (installed.add(sc.applicationId)) {
      sc.addSparkListener(new SparkListener {
        override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit = drain()
      })
    }
    acc
  }

  /** Fire each tripped registration at most once: claim via CAS before
    * invoking, remove after (an already-claimed entry met by another
    * drainer is just removed — never re-fired). */
  private def drain(): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.fired.get()) it.remove()
      else if (e.acc.value > 0 && e.fired.compareAndSet(false, true)) {
        it.remove()
        e.warn(e.acc.value)
      }
    }
  }

  /** Test hook: fire any tripped warnings immediately (the listener bus
    * is asynchronous; specs assert deterministically through this). */
  private[graft] def drainNow(): Unit = drain()
}
