package graft.streaming

import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow, Offset => V2Offset}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

/** Commit-granularity admission control shared by the two table stream
  * sources ([[GraftTableSource]], [[DeltaStreamSource]]) — the Delta
  * `maxFilesPerTrigger` analogue at graft's offset granularity: at most
  * `maxCommitsPerTrigger` COMMITS per micro-batch, so a stream catching up
  * on a long table history drains in bounded batches instead of one giant
  * range (bounded state, bounded sink transactions). The plain-mode
  * initial snapshot is ONE unit (a snapshot is not splittable by
  * commits); with `startingVersion` (or CDF mode) the first range is
  * capped like any other.
  *
  * Implemented through SupportsAdmissionControl + SupportsTriggerAvailableNow
  * (the FileStreamSource pattern) rather than by capping `getOffset`: the
  * engine's AvailableNow WRAPPER latches a v1 source's first offset and
  * ends the run there — a capped getOffset would leave the run 1/N
  * drained. Here [[prepareForTriggerAvailableNow]] latches the TRUE head
  * and [[latestOffset]] advances min(latch, base + N) per batch, so an
  * AvailableNow run drains to the latch in ⌈commits/N⌉ batches. Restart
  * replay re-syncs the base via [[syncPos]] from getBatch. */
private[streaming] trait CommitRateLimit extends SupportsTriggerAvailableNow {

  /** Lower-cased source options. */
  protected def rlOptions: Map[String, String]
  /** Live head version of the table, None when the table is empty. */
  protected def liveLatestVersion: Option[Long]
  /** CDF mode flag (changes the fresh-stream rate-limit base). */
  protected def rlCdf: Boolean
  /** User-pinned first version, when set. */
  protected def rlStartingVersion: Option[Long]

  protected final val maxCommits: Option[Long] =
    rlOptions.get("maxcommitspertrigger").map(_.toLong).map { n =>
      require(n >= 1, s"maxCommitsPerTrigger must be >= 1, got $n")
      n
    }

  /** Highest version handed to the engine (getBatch calls [[syncPos]] on
    * restart replay, so a recovered stream rate-limits from its
    * checkpoint, not from scratch). */
  @volatile private var pos: Option[Long] = None
  @volatile private var availableNowLatch: Option[Long] = None
  @volatile private var latched = false

  protected final def versionOf(o: V2Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  /** First-batch rate-limit base when no position is known: CDF /
    * startingVersion ranges start just below their first version; the
    * plain-mode initial snapshot has no base — it is ONE unit at the head
    * (a snapshot is not splittable by commits). */
  private def freshBase: Option[Long] =
    if (rlCdf) Some(rlStartingVersion.getOrElse(0L) - 1)
    else rlStartingVersion.map(_ - 1)

  /** Call from getBatch so restart replay (which precedes any
    * latestOffset) re-seats the rate-limit base. */
  protected final def syncPos(endV: Long): Unit =
    pos = Some(math.max(endV, pos.getOrElse(Long.MinValue)))

  override final def prepareForTriggerAvailableNow(): Unit = {
    availableNowLatch = liveLatestVersion
    latched = true // empty-at-prepare stays empty: commits racing the run wait
  }

  override final def getDefaultReadLimit: ReadLimit =
    maxCommits.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  /** Admission-controlled offset resolution (the engine prefers this over
    * the v1 getOffset): end = min(head-or-latch, base + maxCommits), where
    * base is the engine's start offset, falling back to the highest
    * version this instance handed out, then to [[freshBase]]. */
  override final def latestOffset(startOffset: V2Offset, limit: ReadLimit): V2Offset = {
    val live = liveLatestVersion
    val latest =
      if (latched) availableNowLatch.flatMap(l => live.map(math.min(l, _)))
      else live
    val cap = limit match {
      case r: ReadMaxRows => Some(r.maxRows())
      case _ => None
    }
    val base = Option(startOffset).map(versionOf).orElse(pos).orElse(freshBase)
    val endV = (latest, cap) match {
      case (Some(l), Some(m)) => Some(base.fold(l)(b => math.min(l, b + m)))
      case (l, _) => l
    }
    endV.foreach(syncPos)
    endV.map(LongOffset(_)).orNull
  }
}
