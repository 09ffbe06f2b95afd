package graft.streaming

/** Typed rows for the stateful streaming operators. Timestamps are epoch
  * milliseconds (the reference's `ts` convention, FIXTURES.md §1). */
case class KeyedEvent(key: String, ts: Long, payload: String)

/** A page view for visitor/session analytics (subset of the log-event
  * page branch; `lastPageId == None` ⇒ session entry). */
case class PageEvent(mid: String, pageId: String, lastPageId: Option[String],
    isNew: String, ts: Long)

/** Output of daily-dedup: the first event of `key` on `date`. */
case class DailyFirst(key: String, date: String, ts: Long)

/** Output of bounce detection: a session-entry event with no qualifying
  * follow-up (ref DwdTrafficUserJumpDetail semantics). */
case class Bounce(mid: String, ts: Long)

/** Login activity classification (ref DwsUserUserLoginWindow): `uu` —
  * first login of the day; `back` — returning after ≥ backDays gap. */
case class LoginActivity(uid: String, date: String, ts: Long,
    uu: Boolean, back: Boolean)

/** Input to the N-step funnel: `step` is the 0-based pattern position
  * this event satisfies (caller maps event types to steps). */
case class FunnelEvent(key: String, ts: Long, step: Int)

/** A document arriving on an ingest stream (`ts` = epoch ms). */
case class DocEvent(docId: Long, ts: Long, text: String)

/** One LSH band row of a document's minhash signature: the bucket key
  * is the minhash PAIR itself (the q30 convention). */
case class BandRow(h1: Long, h2: Long, docId: Long, ts: Long)

/** Streaming near-dup candidate: `docId` landed in band bucket
  * (h1, h2) already claimed by the earlier `anchorDoc`. */
case class LshCandidate(h1: Long, h2: Long, anchorDoc: Long,
    anchorTs: Long, docId: Long, ts: Long)

/** A document's content hash on the ingest stream (md5 hex of text). */
case class HashRow(m: String, docId: Long, ts: Long)

/** Online exact-dup hit: `docId`'s content hash `m` was already
  * claimed by the earlier `anchorDoc`. */
case class ExactDupHit(m: String, anchorDoc: Long, anchorTs: Long,
    docId: Long, ts: Long)

/** One outcome per key that reached step 0: either the pattern completed
  * (all steps in order, each within its gap timeout) or it expired with
  * `stepsReached` of them done. `anchorTs` is the step-0 event time. */
case class FunnelOutcome(key: String, anchorTs: Long, completed: Boolean,
    lastStepTs: Long, stepsReached: Int)
