package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Stateful adaptive-recrawl tracking via `mapGroupsWithState` — the
  * Structured-Streaming custom-state surface over the reference crawler's
  * per-page scheduling metadata (crawler/src/storage/crawl_metadata.h:27-55,
  * enriched_storage.h:39-40):
  *
  *  - `crawl_count` increments per observation;
  *  - content change (hash differs from the last seen) RESETS the backoff
  *    multiplier to 1 (`reset_backoff_on_change`), no change DOUBLES it,
  *    capped at 8 (`increase_backoff`);
  *  - `change_frequency` is an exponential moving average of the
  *    changed/unchanged signal (alpha 0.3);
  *  - next-crawl delay follows `update_next_crawl_time`
  *    (crawl_metadata.h:39-45) exactly: backoffHours =
  *    min(720, max(1, hoursSincePreviousChange * multiplier)), delay =
  *    max(15 min, backoffHours * 60) — the adaptive time-delta term is the
  *    hours since the page last CHANGED, tracked in state
  *    (`previous_change_time`, crawl_metadata.h:24,49), with the latest
  *    observation timestamp standing in for wall-clock `now` so the fold
  *    stays deterministic.
  *
  * State lives in the streaming state store: keyed by domain, checkpointed
  * with the query, recovered on restart — the scale posture is one state
  * row per domain (10^7-10^8 at web scale), partitioned by the grouping
  * key, never driver-resident. Deterministic: per-batch rows are folded in
  * (ts, contentHash) order.
  */
object CrawlScheduler {

  val Alpha = 0.3
  val BaseBackoffHours = 1L
  val MaxBackoffMultiplier = 8
  val MaxDelayMinutes: Long = 24L * 30 * 60 // 30 days, reference cap
  val MinDelayMinutes: Long = 15L           // reference floor

  case class Observation(domain: String, contentHash: String,
      ts: java.sql.Timestamp)

  case class DomainState(crawlCount: Long, lastHash: String,
      backoffMultiplier: Int, changeFrequency: Double,
      lastChangeTsMillis: Long, lastSeenTsMillis: Long)

  case class Schedule(domain: String, crawlCount: Long,
      backoffMultiplier: Int, changeFrequency: Double,
      nextCrawlDelayMinutes: Long)

  /** crawl_metadata.h:39-45's clamp, with hours-since-previous-change as
    * the adaptive delta term. A fresh change (delta 0) floors at 1 hour. */
  def delayMinutes(multiplier: Int, hoursSinceChange: Long): Long = {
    val backoffHours =
      math.min(24L * 30, math.max(BaseBackoffHours, hoursSinceChange * multiplier))
    math.min(MaxDelayMinutes, math.max(MinDelayMinutes, backoffHours * 60))
  }

  /** Fold one group's batch rows into its state; emit the updated schedule. */
  def updateState(domain: String, rows: Iterator[Observation],
      state: GroupState[DomainState]): Schedule = {
    var st = state.getOption.getOrElse(DomainState(0L, "", 1, 0.0, 0L, 0L))
    rows.toSeq.sortBy(r => (r.ts.getTime, r.contentHash)).foreach { r =>
      if (st.crawlCount == 0L) {
        // UrlMetadata ctor: previous_change_time = now on first sighting
        st = DomainState(1L, r.contentHash, 1, 0.0, r.ts.getTime, r.ts.getTime)
      } else {
        val changed = r.contentHash != st.lastHash
        val mult =
          if (changed) 1 // reset_backoff_on_change
          else math.min(MaxBackoffMultiplier, st.backoffMultiplier * 2)
        val freq = Alpha * (if (changed) 1.0 else 0.0) +
          (1.0 - Alpha) * st.changeFrequency
        val lastChange = if (changed) r.ts.getTime else st.lastChangeTsMillis
        st = DomainState(st.crawlCount + 1, r.contentHash, mult,
          BigDecimal(freq).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          lastChange, r.ts.getTime)
      }
    }
    state.update(st)
    val hoursSinceChange =
      math.max(0L, (st.lastSeenTsMillis - st.lastChangeTsMillis) / 3600000L)
    Schedule(domain, st.crawlCount, st.backoffMultiplier, st.changeFrequency,
      delayMinutes(st.backoffMultiplier, hoursSinceChange))
  }

  /** Streaming (or batch) tracking: one Schedule row per domain per
    * micro-batch. Use outputMode("update") with a streaming source. */
  def track(observations: Dataset[Observation]): Dataset[Schedule] = {
    implicit val stEnc = Encoders.product[DomainState]
    implicit val outEnc = Encoders.product[Schedule]
    observations.groupByKey(_.domain)(Encoders.STRING)
      .mapGroupsWithState[DomainState, Schedule](GroupStateTimeout.NoTimeout())(
        updateState _)
  }
}
