package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.time.Instant
import scala.collection.concurrent.TrieMap

/** Per-token governance — the reference's internal/governance: rate
  * limits (sliding windows), query quotas (fixed hour/day windows), and
  * per-query row/duration caps, keyed by token id. Policies persist as
  * one JSON record per token under `{root}/_admin/governance/`; the
  * counters are in-memory process state, like the reference's
  * slidingWindowCounter / quotaTracker (a restart forgives the current
  * window — same trade the reference makes).
  */
object Governance {

  /** internal/governance/manager.go:16 Policy. 0 = unlimited. */
  final case class Policy(
      tokenId: Long,
      tokenName: String,
      rateLimitPerMinute: Int,
      rateLimitPerHour: Int,
      maxQueriesPerHour: Int,
      maxQueriesPerDay: Int,
      maxRowsPerQuery: Int,
      maxScanDurationSec: Int,
      createdAt: String,
      updatedAt: String) {
    def json: String = {
      def q(s: String) = graft.query.QueryFacade.jsonStr(s)
      s"""{"token_id":$tokenId,"token_name":${q(tokenName)},""" +
        s""""rate_limit_per_minute":$rateLimitPerMinute,""" +
        s""""rate_limit_per_hour":$rateLimitPerHour,""" +
        s""""max_queries_per_hour":$maxQueriesPerHour,""" +
        s""""max_queries_per_day":$maxQueriesPerDay,""" +
        s""""max_rows_per_query":$maxRowsPerQuery,""" +
        s""""max_scan_duration_sec":$maxScanDurationSec,""" +
        s""""created_at":${q(createdAt)},"updated_at":${q(updatedAt)}}"""
    }
  }

  /** internal/governance/manager.go:42 EnforcementResult. */
  final case class Enforcement(allowed: Boolean, reason: String = "",
      retryAfterSec: Int = 0, maxRows: Int = 0, maxDurationSec: Int = 0)

  /** Sliding-window rate limiter over fixed slots
    * (internal/governance/sliding_window.go): a circular buffer of
    * per-slot counts; Allow() advances the window, clears expired
    * slots, and admits while the rolling total is under the limit. */
  final class SlidingWindow(windowMillis: Long, slotCount: Int, limit: Int,
      clock: () => Long = () => System.currentTimeMillis()) {
    private val slotMillis = math.max(1L, windowMillis / slotCount)
    private val slots = new Array[Int](slotCount)
    private var current = 0
    private var lastSlotTime = clock() / slotMillis * slotMillis
    private var total = 0

    private def advance(): Unit = {
      val now = clock() / slotMillis * slotMillis
      val steps = ((now - lastSlotTime) / slotMillis).toInt
      if (steps <= 0) return
      if (steps >= slotCount) {
        java.util.Arrays.fill(slots, 0); total = 0; current = 0
      } else (0 until steps).foreach { _ =>
        current = (current + 1) % slotCount
        total -= slots(current)
        slots(current) = 0
      }
      lastSlotTime = now
    }

    def allow(): Boolean = synchronized {
      advance()
      if (total >= limit) false
      else { slots(current) += 1; total += 1; true }
    }

    /** Seconds until the oldest occupied slot expires. */
    def retryAfterSec(): Int = synchronized {
      advance()
      var i = 1
      while (i <= slotCount) {
        if (slots((current + i) % slotCount) > 0) {
          val ms = i.toLong * slotMillis
          return math.max(1, (ms + 999) / 1000).toInt
        }
        i += 1
      }
      1
    }

    def count(): Int = synchronized { advance(); total }
  }

  /** Fixed-window hour/day quota (internal/governance/quota_tracker.go):
    * counters reset when their window rolls. */
  final class QuotaTracker(maxPerHour: Int, maxPerDay: Int,
      clock: () => Long = () => System.currentTimeMillis()) {
    private var hourStart = clock()
    private var dayStart = hourStart
    private var hourCount = 0
    private var dayCount = 0

    private def maybeReset(): Unit = {
      val now = clock()
      if (now - hourStart >= 3600000L) { hourStart = now; hourCount = 0 }
      if (now - dayStart >= 86400000L) { dayStart = now; dayCount = 0 }
    }

    def allowQuery(): (Boolean, String) = synchronized {
      maybeReset()
      if (maxPerHour > 0 && hourCount >= maxPerHour)
        (false, s"Query quota exceeded: $maxPerHour queries per hour")
      else if (maxPerDay > 0 && dayCount >= maxPerDay)
        (false, s"Query quota exceeded: $maxPerDay queries per day")
      else { hourCount += 1; dayCount += 1; (true, "") }
    }

    def usage(): (Int, Int) = synchronized { maybeReset(); (hourCount, dayCount) }
  }
}

final class Governance(root: String, hconf: Configuration,
    clock: () => Long = () => System.currentTimeMillis()) {
  import Governance._

  private val mapper = new ObjectMapper()
  private val dir = new Path(root, "_admin/governance")
  private val lock = new Object

  private val policies = TrieMap.empty[Long, Policy]
  private val minuteLimiters = TrieMap.empty[Long, SlidingWindow]
  private val hourLimiters = TrieMap.empty[Long, SlidingWindow]
  private val quotas = TrieMap.empty[Long, QuotaTracker]

  locally {
    RecordFiles.list(hconf, dir, ".json").foreach { p =>
      RecordFiles.read(hconf, p).foreach { bytes =>
        val n = mapper.readTree(bytes)
        val pol = Policy(
          n.get("token_id").asLong,
          Option(n.get("token_name")).map(_.asText).getOrElse(""),
          n.get("rate_limit_per_minute").asInt,
          n.get("rate_limit_per_hour").asInt,
          n.get("max_queries_per_hour").asInt,
          n.get("max_queries_per_day").asInt,
          n.get("max_rows_per_query").asInt,
          Option(n.get("max_scan_duration_sec")).map(_.asInt).getOrElse(0),
          n.get("created_at").asText, n.get("updated_at").asText)
        policies(pol.tokenId) = pol
      }
    }
  }

  private def persist(p: Policy): Unit =
    RecordFiles.write(hconf, dir, s"${p.tokenId}.json", p.json.getBytes("UTF-8"))

  def set(tokenId: Long, tokenName: String, rateLimitPerMinute: Int,
      rateLimitPerHour: Int, maxQueriesPerHour: Int, maxQueriesPerDay: Int,
      maxRowsPerQuery: Int, maxScanDurationSec: Int): Policy =
    lock.synchronized {
      Seq(rateLimitPerMinute, rateLimitPerHour, maxQueriesPerHour,
        maxQueriesPerDay, maxRowsPerQuery, maxScanDurationSec)
        .foreach(v => require(v >= 0, "limits must be >= 0 (0 = unlimited)"))
      val now = Instant.now().toString
      val created = policies.get(tokenId).map(_.createdAt).getOrElse(now)
      val p = Policy(tokenId, tokenName, rateLimitPerMinute, rateLimitPerHour,
        maxQueriesPerHour, maxQueriesPerDay, maxRowsPerQuery,
        maxScanDurationSec, created, now)
      persist(p)
      policies(tokenId) = p
      // re-key the live counters so new limits take effect immediately
      // (manager.go updateTrackersForToken)
      minuteLimiters.remove(tokenId); hourLimiters.remove(tokenId)
      quotas.remove(tokenId)
      p
    }

  def get(tokenId: Long): Option[Policy] = policies.get(tokenId)
  def list(): Seq[Policy] = policies.values.toSeq.sortBy(_.tokenId)

  def delete(tokenId: Long): Boolean = lock.synchronized {
    policies.remove(tokenId) match {
      case Some(_) =>
        minuteLimiters.remove(tokenId); hourLimiters.remove(tokenId)
        quotas.remove(tokenId)
        RecordFiles.delete(hconf, new Path(dir, s"$tokenId.json"))
        true
      case None => false
    }
  }

  /** manager.go:342 CheckRateLimit: per-minute then per-hour window. */
  def checkRateLimit(tokenId: Long): Enforcement = policies.get(tokenId) match {
    case None => Enforcement(allowed = true)
    case Some(p) =>
      if (p.rateLimitPerMinute > 0) {
        val lim = minuteLimiters.getOrElseUpdate(tokenId,
          new SlidingWindow(60000L, 60, p.rateLimitPerMinute, clock))
        if (!lim.allow())
          return Enforcement(allowed = false,
            s"Rate limit exceeded: ${p.rateLimitPerMinute} queries per minute",
            retryAfterSec = lim.retryAfterSec())
      }
      if (p.rateLimitPerHour > 0) {
        val lim = hourLimiters.getOrElseUpdate(tokenId,
          new SlidingWindow(3600000L, 60, p.rateLimitPerHour, clock))
        if (!lim.allow())
          return Enforcement(allowed = false,
            s"Rate limit exceeded: ${p.rateLimitPerHour} queries per hour",
            retryAfterSec = lim.retryAfterSec())
      }
      Enforcement(allowed = true)
  }

  /** manager.go:379 CheckQuota: hour/day quotas, then the per-query
    * row/duration caps ride back on the allow. */
  def checkQuota(tokenId: Long): Enforcement = policies.get(tokenId) match {
    case None => Enforcement(allowed = true)
    case Some(p) =>
      if (p.maxQueriesPerHour > 0 || p.maxQueriesPerDay > 0) {
        val tracker = quotas.getOrElseUpdate(tokenId,
          new QuotaTracker(p.maxQueriesPerHour, p.maxQueriesPerDay, clock))
        val (ok, reason) = tracker.allowQuery()
        if (!ok) return Enforcement(allowed = false, reason)
      }
      Enforcement(allowed = true, maxRows = p.maxRowsPerQuery,
        maxDurationSec = p.maxScanDurationSec)
  }

  /** manager.go:414 GetTokenUsage. */
  def usageJson(tokenId: Long): String = {
    val (h, d) = quotas.get(tokenId).map(_.usage()).getOrElse((0, 0))
    val p = policies.get(tokenId)
    val remMin = p.filter(_.rateLimitPerMinute > 0).map(pol =>
      math.max(0, pol.rateLimitPerMinute -
        minuteLimiters.get(tokenId).map(_.count()).getOrElse(0))).getOrElse(-1)
    val remHour = p.filter(_.rateLimitPerHour > 0).map(pol =>
      math.max(0, pol.rateLimitPerHour -
        hourLimiters.get(tokenId).map(_.count()).getOrElse(0))).getOrElse(-1)
    s"""{"token_id":$tokenId,"queries_this_hour":$h,"queries_this_day":$d,""" +
      s""""rate_limit_remaining_per_minute":$remMin,""" +
      s""""rate_limit_remaining_per_hour":$remHour}"""
  }
}
