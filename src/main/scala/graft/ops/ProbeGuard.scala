package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Self-enforcing size contract for the forced-broadcast PROBE shapes.
  *
  * The incremental paths keep standing tables (corpus fingerprints,
  * LSH band indexes, entity-key registries) on a scan by BROADCASTING
  * the batch-derived key set into the join — `broadcast()` is forced,
  * bypassing `spark.sql.autoBroadcastJoinThreshold`, because the
  * standing side has no stats and the optimizer would otherwise
  * sort-merge both sides, re-shuffling the corpus on every daily run.
  * Forcing the hint moves the size responsibility onto the caller: a
  * "batch" far beyond daily scale would be collected to the driver and
  * OOM it — silently, at runtime, with no mention of the contract.
  * (The reference has the same silent assumption in its PK-set preload,
  * `lwetl/programs/db_copy/main.py:260-268`, which materializes every
  * target-table key in client memory; the engine should do better.)
  *
  * This guard makes the contract self-enforcing: the key set is
  * COUNTED before the hint is attached (one bounded aggregation — the
  * guard never scans the standing side), and above the cap the plan
  * falls back to the un-hinted join — the pre-probe sort-merge shape,
  * slower but correct at any size — with a loud log line explaining
  * both the fallback and the knob.
  *
  * The count is an eager job at operator-BUILD time, the
  * [[graft.dedup.Dedup.dropHotBuckets]] discipline (the decision must
  * be loggable, and baked into the plan, before anything
  * materializes). Callers on the daily path count a batch-scale frame
  * that is already persisted or one cheap map away from a persisted
  * parent; abusive callers pay one scan of the oversized frame — the
  * scan that saves the driver.
  *
  * Cap: `graft.probe.maxKeys` (runtime conf), default
  * [[ProbeGuard.DefaultMaxKeys]]. Keyed probe rows serialize to
  * ~50-100 bytes, so the default 4M-row cap bounds a forced broadcast
  * at roughly 200-400 MB — comfortable on a production driver, far
  * past any daily-batch shape. Set it to 0 or negative to disable the
  * guard (always hint — the pre-guard behavior, for callers that have
  * externally verified the size). The decision is baked into the
  * returned plan at build time; changing the conf later re-decides
  * only newly built plans.
  */
object ProbeGuard {

  /** Runtime conf key for the probe-broadcast row cap. */
  val ConfKey = "graft.probe.maxKeys"

  /** Runtime conf key for the over-cap policy: `fallback` (default —
    * revert to the sort-merge shape, loud log) or `fail` (throw with
    * the same guidance). A daily job with a latency SLA may prefer
    * the loud failure: the fallback shuffles the standing table,
    * which is correct at any size but can quietly turn a minutes-run
    * into hours at corpus scale — visible only as a stderr line. */
  val PolicyKey = "graft.probe.onOverflow"

  /** Default cap on forced-broadcast probe rows (see object doc). */
  val DefaultMaxKeys: Long = 4000000L

  /** Log sink — a hook so specs can assert the fallback is never
    * silent; production default is stderr. */
  @volatile private[graft] var log: String => Unit =
    m => System.err.println(m)

  private def cap(df: DataFrame): Long =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(v) =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$ConfKey must be a long, got '$v'")
        }
      case None => DefaultMaxKeys
    }

  /** Counts `keys` and reports whether a forced broadcast is within
    * the contract. `false` comes with a loud log line naming the site,
    * the size, and the remedies — or, under `graft.probe.onOverflow=
    * fail`, an IllegalStateException carrying the same guidance. One
    * decision should gate one whole probe SHAPE: a plan whose
    * candidate fetches are downstream of a guarded batch key set
    * inherits its bound through the hot-bucket caps, so counting every
    * derived frame again would add jobs without adding safety. */
  def fits(keys: DataFrame, site: String): Boolean = {
    val mx = cap(keys)
    if (mx <= 0L) return true
    val n = keys.count()
    val ok = n <= mx
    if (!ok) {
      val msg = s"[probe-guard] $site: probe key set has $n rows, over " +
        s"$ConfKey=$mx (a forced broadcast at this size risks driver " +
        "OOM). This path is sized for daily-batch probes against a " +
        "standing table; for a symmetric corpus-scale side use the " +
        s"non-probe form, or raise $ConfKey if the driver is " +
        "provisioned for it."
      keys.sparkSession.conf.getOption(PolicyKey)
          .getOrElse("fallback") match {
        case "fail" => throw new IllegalStateException(msg)
        case "fallback" => log(msg + " Falling back to the shuffle join.")
        case other => throw new IllegalArgumentException(
          s"$PolicyKey must be 'fallback' or 'fail', got '$other'")
      }
    }
    ok
  }

  /** The hint-or-fallback form for a single join: `broadcast(keys)`
    * within the contract, the bare frame (sort-merge fallback) above
    * it. */
  def hinted(keys: DataFrame, site: String): DataFrame =
    if (fits(keys, site)) broadcast(keys) else keys
}
