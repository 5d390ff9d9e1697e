package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension over the `events` table shape
  * (SURVEY §2.7/§7.4.8 — the reference has no streaming; this is the
  * scale path for continuous ingestion).
  *
  * Batch/stream symmetry: every transform here ALSO works on a batch
  * DataFrame of the same schema (tested against the batch queries
  * q18/q19), which is the property that matters at 100 TB — backfill
  * and live paths share one definition.
  */
object EventsStream {

  /** Tumbling-window per-type counts with a watermark: the streaming
    * form of q18_events_hourly. State is bounded by the watermark;
    * partial aggregation happens map-side before the keyed shuffle. */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Gap-based sessionization with custom state
    * (flatMapGroupsWithState): emits a session when a gap > `gapMinutes`
    * arrives or — with `timeout = true` — when the group's
    * processing-time timeout fires (live streams; note a
    * processing-time timeout keeps the query permanently re-triggering,
    * so tests and drain-and-stop jobs run with `timeout = false`).
    * The batch analogue is q19_sessionize (lag + gap threshold). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 timeout: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        if (timeout) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val out = Vector.newBuilder[SessionOut]
            var cur = state.getOption.orNull
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case null =>
                  cur = SessionState(t, t, 1L)
                case s if t - s.lastSeen > gapMs =>
                  out += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastSeen), s.nEvents)
                  cur = SessionState(t, t, 1L)
                case s =>
                  cur = s.copy(lastSeen = t, nEvents = s.nEvents + 1)
              }
            }
            state.update(cur)
            if (timeout) state.setTimeoutDuration(s"$gapMinutes minutes")
            out.result().iterator
          }
      }
  }

  /** Streaming dedup on a fingerprint column with watermarked state —
    * `dropDuplicates` keyed state is the streaming form of exact dedup. */
  def dedupStream(events: DataFrame, keyCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming NEAR-dup dedup: one native codegen'd pass per event
    * (`graft_simhash_tok` — signature AND token count from a single
    * tokenize) feeding watermark-bounded
    * `dropDuplicatesWithinWatermark` on (signature, token count).
    * Events whose token MULTISETS match — exact copies, but also
    * reordered/retokenized boilerplate that an exact-key dedup would
    * let through — collapse to the first arrival while still in
    * flight (same multiset ⇒ same signature AND same count).
    *
    * Relation to the batch path: the stream key partitions strictly
    * FINER than [[graft.dedup.Dedup.simhashNearDupPairs]]' hamming-0
    * classes — a batch hamming-0 pair of DIFFERENT-length texts (a
    * random signature collision, not a near-dup) stays two events
    * here. The spec pins first-arrival-survives plus exact agreement
    * with a batch groupBy over the same shipped key expression.
    *
    * Hamming 0 is deliberately the streaming threshold: banded
    * hamming>0 matching needs a candidate JOIN (any-band collision),
    * which has no bounded-state single-key streaming form — an event's
    * four bands would need cross-key coordination. Signature-exact
    * dedup is the part that streams with O(watermark) state; pairs at
    * hamming 1-3 remain the batch path's job.
    *
    * Null-text events are dropped, mirroring the batch pair finder:
    * a contentless event has no near-dup meaning, and its null
    * signature would otherwise collapse ALL null-text events into one
    * surviving row.
    *
    * COLLISION CAVEAT — this is signature dedup, so a drop is
    * irreversible and a random 32-bit collision between UNRELATED
    * texts inside one watermark silently loses a distinct event. The
    * dedup key is therefore (signature, token count): near-identical
    * multisets share both, while random collisions must now also match
    * on length — cutting the birthday rate by the token-count
    * cardinality. The residual risk is inherent to in-flight signature
    * dedup; size the watermark so in-window distinct volume stays far
    * below the ~2^32 × counts keyspace, or use the batch pair finder
    * (which emits inspectable pairs instead of deleting) when loss is
    * unacceptable. */
  def nearDupDedupStream(events: DataFrame, textCol: String,
                         watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    events
      .withColumn("_st", bridge.column(
        graft.functions.SimHashTok(bridge.expression(col(textCol)))))
      .filter(col("_st").isNotNull)
      .withColumn("_sig", col("_st.sig"))
      .withColumn("_ntok", col("_st.ntok"))
      .drop("_st")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_sig", "_ntok")
      .drop("_sig", "_ntok")
  }

  /** Stream-static enrichment: join the event stream against a slowly-
    * changing dimension snapshot. Stateless in Structured Streaming
    * (the static side is re-planned per micro-batch), and the broadcast
    * hint keeps it shuffle-free on the stream side — the standard shape
    * for decorating a 100 TB/day event firehose with dimension
    * attributes. Works identically on a batch frame (gate q57). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), events(eventKey) === dim(dimKey))

  /** STREAM-STREAM interval join: each purchase attributed to the same
    * user's clicks in the `lookbackMinutes` before it. Both sides are
    * watermarked and the join carries an event-time range constraint —
    * the two conditions Structured Streaming needs to BOUND the join
    * state (clicks older than purchase-watermark − lookback are evicted;
    * without the range constraint the click buffer would grow forever).
    * Inner join ⇒ results emit as soon as both rows arrive; the shape a
    * 100 TB/day clickstream runs continuously.
    *
    * Batch/stream symmetric like everything here: on batch frames the
    * watermarks are no-ops and this is a plain range join (the
    * event-time cousin of q39's as-of join, which keeps only the LAST
    * preceding click where this keeps ALL in the window). */
  def purchaseAttribution(events: DataFrame, lookbackMinutes: Int = 30,
                          watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts")
          - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"), col("purchase_ts"), col("click_ts"))
  }

  /** Enriched windowed rollup: hourly event counts per customer nation
    * — stream-static join feeding a watermarked tumbling-window agg.
    * Batch/stream symmetric like [[hourlyCounts]]. */
  def nationHourly(events: DataFrame, customer: DataFrame,
                   watermark: String = "1 hour"): DataFrame =
    enrichWithDim(events, customer.select(col("c_custkey"), col("c_nationkey")),
      "user_id", "c_custkey")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("c_nationkey"),
        col("n"), col("total_value"))
}
