package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming-shaped operators over the `events` table.
  *
  * The reference has no streaming surface (SURVEY.md §2.7 [ABSENT]); these
  * transforms are written against an unbounded DataFrame contract so the
  * same code serves `spark.read` (batch backfill, oracle-gated) and
  * `spark.readStream` (live path, exercised in the test suite via a
  * memory stream + watermark).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. `ts` must be a
    * TimestampType column; for streaming inputs, pass a watermark delay to
    * bound state. */
  def windowedStats(events: DataFrame, windowLen: String = "10 minutes",
                    watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    src.groupBy(window(col("ts"), windowLen).as("w"), col("etype"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("win_start"), col("etype"), col("n"),
        col("total"))
  }

  /** Per-user running event counts — the `mapGroupsWithState`-shaped
    * stateful op is introduced in the streaming spec; the batch-equivalent
    * here is a windowed cumulative count. */
  def userActivity(events: DataFrame): DataFrame =
    events.groupBy(col("userid"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("etype") === "error", 1).otherwise(0)).as("n_errors"),
        max(col("ts")).as("last_ts"))

  /** Streaming dedup on a key (e.g. content fingerprint): keeps the first
    * arrival of each key; the watermark bounds the per-key dedup state so
    * it ages out instead of growing unboundedly — the standard shape for
    * at-least-once ingestion feeding a training corpus. Works unchanged
    * on a batch frame (dropDuplicates semantics, no watermark needed). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark("ts", d))
    if (src.isStreaming && watermarkDelay.isDefined)
      src.dropDuplicatesWithinWatermark(keyCols)
    else src.dropDuplicates(keyCols)
  }

  /** Relational (batch/backfill) sessionization — the window-function
    * formulation of [[sessionize]]'s gap rule: a session breaks where
    * the gap to the previous same-user event exceeds `gapMs`; the
    * running count of breaks is the session id. Equal-timestamp ties
    * cannot change the result (a 0 gap never breaks), so the output is
    * deterministic and oracle-checkable. Two window passes over one
    * shuffle on `userid` + one aggregate — no per-user state, scales as
    * a plain sort-based window at 100 TB. `ts` is epoch-nanos (long). */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("userid").orderBy("ts")
    val gapNs = gapMs * 1000000L
    events
      .withColumn("__brk",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1)
          .otherwise(0))
      .withColumn("__sess", sum(col("__brk")).over(w))
      .groupBy(col("userid"), col("__sess"))
      .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
        count(lit(1)).as("n_events"))
      .drop("__sess")
  }

  /** Stream-stream keyed interval join: each left event pairs with the
    * right events of the same key within `[l.ts, l.ts + window)`. This is
    * THE streaming-legal form of a time-bounded join — Structured
    * Streaming requires an equi-key plus a two-sided event-time bound so
    * both state stores can evict rows past the watermark (an as-of join's
    * unbounded look-back cannot stream; bound it with a window and it
    * becomes this). Works unchanged on batch frames. Both inputs need
    * TimestampType `ts`; rename right columns before the call. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   rightKey: String, rightTs: String, window: String,
                   watermarkDelay: Option[String] = None): DataFrame = {
    val l = watermarkDelay.fold(left)(d => left.withWatermark("ts", d))
    val r = watermarkDelay.fold(right)(d =>
      right.withWatermark(rightTs, d))
    l.join(r, col(key) === col(rightKey) &&
      col(rightTs) >= col("ts") &&
      col(rightTs) < col("ts") + expr(s"INTERVAL $window"))
  }

  case class SessionEvent(userid: Long, ts: java.sql.Timestamp,
      etype: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(userid: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Int)

  /** Gap-based sessionization over a stream via
    * `flatMapGroupsWithState` + processing-time timeout: a user's events
    * accumulate into one session state; a quiet period of `gap` closes
    * the session and emits it. State per key is O(1) — this scales to
    * arbitrarily many users because Spark shards the state store by key.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 useTimeout: Boolean = true): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    // useTimeout=false closes sessions only via in-batch gaps — needed
    // for deterministic tests and for batch (backfill) execution, where
    // processing-time timeouts keep the micro-batch engine busy forever
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.userid)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userid: Long, evs: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  out += Session(userid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None => cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            out.result().iterator
          }
      }
  }

  case class BandDoc(band: Long, ord: Long, id: Long,
      shingles: Seq[Long])
  case class BandMember(ord: Long, id: Long, shingles: Seq[Long])
  case class BandBucketState(members: Seq[BandMember])
  case class DupHit(id: Long, dupOf: Long)

  /** Streaming keep-first near-duplicate filter — the ingestion-time
    * form of [[graft.pipeline.Dedup.nearDupKeepFirst]]: arrivals are
    * the per-(document, band) rows of
    * [[graft.pipeline.Dedup.bandArrivals]] (same shingle/signature/
    * band formulas as the batch operator, so buckets agree exactly);
    * state per band bucket is the members seen so far; each arrival
    * exact-Jaccard-verifies against its bucket's members and emits a
    * [[DupHit]] for its FIRST verified earlier near-duplicate. The
    * distinct hit ids are the suppressed documents — a doc-level
    * `dropDuplicates("id")` (or the consumer's anti join) merges the
    * per-band hits; equivalence with the batch twin is pinned in
    * PipelineSpec on a MemoryStream.
    *
    * Semantics match the batch twin's order-independent contract: a
    * suppressed arrival still JOINS the bucket state, so its own
    * later duplicates are suppressed too. Batch groups are processed
    * in (ord, id) order, which equals arrival order for an in-order
    * source; out-of-order arrivals within a micro-batch are sorted,
    * across micro-batches the keep-first winner is the earlier BATCH
    * (the standard streaming at-least-once caveat — the watermark
    * bounds it).
    *
    * 100 TB shape: state is sharded by band bucket across executors;
    * per-bucket membership is capped at `maxBucketSize` (the batch
    * operator's guard — an overflowing bucket stops ADMITTING new
    * state members but still verifies arrivals against the retained
    * cap, trading recall exactly like the batch drop, bounded cost
    * either way). With `useTimeout` a quiet bucket evicts after
    * `evictMs` processing time — the state-size bound for unbounded
    * runs. */
  def nearDupBandDups(arrivals: Dataset[BandDoc], threshold: Double,
      maxBucketSize: Int = 200, useTimeout: Boolean = false,
      evictMs: Long = 3600000L): Dataset[DupHit] = {
    require(threshold > 0.0, "threshold must be positive")
    implicit val hitEnc = Encoders.product[DupHit]
    implicit val stEnc = Encoders.product[BandBucketState]
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    arrivals.groupByKey(_.band)(Encoders.scalaLong)
      .flatMapGroupsWithState[BandBucketState, DupHit](
        OutputMode.Append(), timeoutConf) {
        (_: Long, evs: Iterator[BandDoc],
         state: GroupState[BandBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (e.ord, e.id))
            var members = state.getOption
              .map(_.members.toVector).getOrElse(Vector.empty)
            val out = Seq.newBuilder[DupHit]
            sorted.foreach { e =>
              val inc = e.shingles.toSet
              val na = inc.size
              val hit = members.find { m =>
                val inter = m.shingles.count(inc.contains)
                val union = na + m.shingles.size - inter
                union > 0 &&
                  inter.toDouble / union.toDouble >= threshold
              }
              hit.foreach(m => out += DupHit(e.id, m.id))
              if (members.size < maxBucketSize)
                members = members :+ BandMember(e.ord, e.id, e.shingles)
            }
            state.update(BandBucketState(members))
            if (useTimeout) state.setTimeoutDuration(evictMs)
            out.result().iterator
          }
      }
  }

  case class FetchReq(key: Long, ts: Long, id: Long)
  case class RateState(win: Long, n: Int)
  case class Admission(id: Long, key: Long, win: Long, admitted: Int)

  /** Per-key windowed admission rate limiting — the crawl-politeness
    * shape (at most `maxPerWindow` fetches per host per tumbling
    * window; RFC 9309's Crawl-delay generalized to a window quota).
    * Batch/backfill twin: tumbling window = `ts div windowNs`,
    * row_number within (key, window) ordered by (ts, id), admitted =
    * rank ≤ quota. Integer-exact — oracle-gated (s31). One shuffle on
    * (key, window) + a sort-based window; no state, scales as a plain
    * windowed rank at 100 TB. */
  def rateLimitBatch(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxPerWindow: Int, windowNs: Long): DataFrame = {
    require(maxPerWindow >= 1 && windowNs >= 1, "bad rate parameters")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("win"))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("win", expr(s"`$tsCol` div ${windowNs}L"))
      .withColumn("rn", row_number().over(w))
      .select(col(idCol).as("id"), col(keyCol).as("key"), col("win"),
        (col("rn") <= maxPerWindow).cast("int").as("admitted"))
  }

  /** Streaming form of [[rateLimitBatch]]: state per key is just the
    * current window id and its admission count (O(1) per key — the
    * state store shards by host across executors). Arrivals within a
    * micro-batch are processed in (ts, id) order; a new window resets
    * the count. Equivalence with the batch twin on an in-order
    * source is pinned in PipelineSpec across micro-batches. With
    * `useTimeout`, a quiet key's state evicts after one full window
    * of processing time — the unbounded-host-set bound. */
  def rateLimitStream(reqs: Dataset[FetchReq], maxPerWindow: Int,
      windowNs: Long, useTimeout: Boolean = false)
      : Dataset[Admission] = {
    require(maxPerWindow >= 1 && windowNs >= 1, "bad rate parameters")
    implicit val admEnc = Encoders.product[Admission]
    implicit val stEnc = Encoders.product[RateState]
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    reqs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[RateState, Admission](
        OutputMode.Append(), timeoutConf) {
        (key: Long, evs: Iterator[FetchReq],
         state: GroupState[RateState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (e.ts, e.id))
            var cur = state.getOption.getOrElse(RateState(Long.MinValue, 0))
            val out = Seq.newBuilder[Admission]
            sorted.foreach { e =>
              val win = Math.floorDiv(e.ts, windowNs)
              if (win != cur.win) cur = RateState(win, 0)
              val admit = cur.n < maxPerWindow
              cur = cur.copy(n = cur.n + 1)
              out += Admission(e.id, key, win, if (admit) 1 else 0)
            }
            state.update(cur)
            if (useTimeout) state.setTimeoutDuration(
              Math.max(1L, windowNs / 1000000L))
            out.result().iterator
          }
      }
  }
}
