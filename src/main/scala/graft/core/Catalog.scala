package graft.core

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

import org.apache.spark.sql.types._

/** Injectable clock (reference: include/common/clock.hpp:24-60 —
  * Clock::instance() / MockClock for deterministic temporal tests). */
trait Clock { def nowNanos: Long }
/** Epoch-based like the reference clock (include/common/clock.hpp) —
  * System.nanoTime() has an arbitrary per-JVM origin, which would make
  * version stamps incomparable across commit/restore JVM boundaries and
  * break back-dated valid_from comparisons against real epoch times. */
object SystemClock extends Clock {
  def nowNanos: Long = {
    val ts = java.time.Instant.now()
    ts.getEpochSecond * 1000000000L + ts.getNano
  }
}
final class MockClock(start: Long = 0L) extends Clock {
  private val t = new AtomicLong(start)
  def nowNanos: Long = t.get()
  def set(ts: Long): Unit = t.set(ts)
  def advance(by: Long): Long = t.addAndGet(by)
}

/** Edge-type registration. Unlike the reference (whose EdgeStore keys edges
  * by type name only — include/core/edge_store.hpp:34-45), we key by
  * (type, srcLabel, dstLabel): per-schema node-id namespaces (README.md:139)
  * would otherwise make one edge type spanning two source schemas ambiguous
  * (customer#5 vs supplier#5). The reference never mixes source schemas in
  * one type; this generalization keeps the same observable behavior.
  */
final case class EdgeTypeInfo(
    name: String,
    srcLabel: String,
    dstLabel: String,
    props: StructType = new StructType()
)

/** Schema catalog: label -> StructType (id: LongType auto-prepended, like
  * SchemaRegistry::create — include/schema/schema.hpp:168-169), per-label
  * auto-increment id counters starting at 0 (include/core/node.hpp:112-125),
  * and a single global edge-id counter (include/core/edge_store.hpp:40).
  */
final class Catalog {
  private val nodeSchemas = mutable.LinkedHashMap[String, StructType]()
  private val nodeVersions = mutable.HashMap[String, Int]()
  private val nodeCounters = mutable.HashMap[String, AtomicLong]()
  private val edgeTypes =
    mutable.LinkedHashMap[(String, String, String), EdgeTypeInfo]()
  val edgeIdCounter = new AtomicLong(0L)

  /** Register a node schema; `fields` must NOT contain `id`. */
  def createSchema(label: String, fields: Seq[StructField]): StructType =
    synchronized {
      require(!nodeSchemas.contains(label), s"schema exists: $label")
      require(!fields.exists(_.name == "id"), "id is auto-prepended")
      val st = StructType(StructField("id", LongType, nullable = false) +: fields)
      nodeSchemas(label) = st
      nodeVersions(label) = 1
      nodeCounters(label) = new AtomicLong(0L)
      st
    }

  def schemaOf(label: String): StructType =
    nodeSchemas.getOrElse(label,
      throw new IllegalArgumentException(s"unknown schema: $label"))
  def hasSchema(label: String): Boolean = nodeSchemas.contains(label)
  def labels: Seq[String] = nodeSchemas.keys.toSeq
  def bumpVersion(label: String): Unit =
    synchronized { nodeVersions(label) = nodeVersions(label) + 1 }
  def schemaVersion(label: String): Int = nodeVersions.getOrElse(label, 0)

  def nextNodeId(label: String): Long = counter(label).getAndIncrement()
  /** Reserve a contiguous id block for bulk ingest (returns first id). */
  def reserveNodeIds(label: String, n: Long): Long =
    counter(label).getAndAdd(n)
  def nodeCounter(label: String): Long = counter(label).get()
  def setNodeCounter(label: String, v: Long): Unit = counter(label).set(v)
  private def counter(label: String): AtomicLong =
    nodeCounters.getOrElse(label,
      throw new IllegalArgumentException(s"unknown schema: $label"))

  def registerEdgeType(info: EdgeTypeInfo): Unit = synchronized {
    edgeTypes((info.name, info.srcLabel, info.dstLabel)) = info
  }
  def edgeType(name: String, src: String, dst: String): Option[EdgeTypeInfo] =
    edgeTypes.get((name, src, dst))
  /** All registrations of an edge type name (may span several src labels). */
  def edgeTypesNamed(name: String): Seq[EdgeTypeInfo] =
    edgeTypes.valuesIterator.filter(_.name == name).toSeq
  def allEdgeTypes: Seq[EdgeTypeInfo] = edgeTypes.values.toSeq
  def nextEdgeId(): Long = edgeIdCounter.getAndIncrement()
}
