package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.FingerprintRow

/** Streaming stateful exact-dedup (custom state via flatMapGroupsWithState).
  *
  * The batch pipeline dedups a corpus it can see whole; a streaming ingest
  * must dedup each arriving row against EVERYTHING seen so far. State is
  * keyed by the exact content fingerprint (simhash + span — the same
  * identity [[graft.pipeline.Candidates.collapseExact]] collapses on) and
  * holds one Long per distinct fingerprint: how many rows carried it so
  * far. Each row is emitted with `first_seen` (this fingerprint was never
  * seen before → keep for training) and `n_seen_before` (duplicates
  * suppressed so far → audit metric).
  *
  * Scale shape: state is hash-partitioned by fingerprint across executors
  * (one shuffle per micro-batch — unavoidable for exact cross-batch
  * dedup), one Long per DISTINCT fingerprint, and survives restarts via
  * the query's checkpointLocation (the streaming analogue of the batch
  * resume contract; tested by running two AvailableNow passes over a
  * growing directory with a shared checkpoint).
  */
object StreamingDedup {

  final case class DedupEmit(
      image_id: String,
      simhash: Long,
      span: Int,
      first_seen: Boolean,
      n_seen_before: Long
  )

  /** (simhash, simhash_lo, span) → count seen so far; rows within a batch
    * are processed in image_id order so emission is deterministic.
    */
  private def dedupGroup(
      key: (Long, Long, Int),
      rows: Iterator[FingerprintRow],
      state: GroupState[Long]): Iterator[DedupEmit] = {
    var seen = state.getOption.getOrElse(0L)
    val out = rows.toSeq.sortBy(_.image_id).map { r =>
      val e = DedupEmit(r.image_id, r.simhash, r.span, seen == 0L, seen)
      seen += 1
      e
    }
    state.update(seen)
    out.iterator
  }

  /** Attach cross-batch first-seen/duplicate flags to a (streaming or
    * batch) fingerprint Dataset.
    */
  def dedupAgainstState(fps: Dataset[FingerprintRow]): Dataset[DedupEmit] = {
    implicit val emitEnc = Encoders.product[DedupEmit]
    implicit val keyEnc = Encoders.product[(Long, Long, Int)]
    implicit val stateEnc = Encoders.scalaLong
    fps.groupByKey(r => (r.simhash, r.simhash_lo, r.span))
      .flatMapGroupsWithState[Long, DedupEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(dedupGroup)
  }
}
