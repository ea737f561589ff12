package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication over a document stream — the ingest
 * twin of the batch `q_docs_exact_dedup` operator: annotate every
 * arriving document with whether its content hash was already seen,
 * which document is canonical (first arrival in event-time order) and
 * its duplicate index within the clique.
 *
 * Spark's built-in `dropDuplicates` on a watermarked stream can only
 * DROP repeats; a training-data ingest wants the annotation (keep the
 * lineage, route duplicates to a side sink, count clique sizes), which
 * needs custom state: one (canonical_id, seen) pair per content hash
 * via flatMapGroupsWithState, GC'd by event-time timeout.
 *
 * Canonical-election contract (append mode cannot retract an emitted
 * annotation, so this is inherent to ANY streaming dedup, including
 * `dropDuplicates`): the canonical is the first PROCESSED arrival —
 * micro-batch order first, then event-time order within a batch. A
 * later micro-batch delivering an earlier-event-time contender is
 * annotated as a duplicate of the already-elected canonical; only
 * arrivals landing in the same micro-batch re-order by event time. A
 * duplicate arriving after the state horizon re-registers as new (the
 * standard watermark-bounded dedup contract). The batch operator
 * (`q_docs_exact_dedup`, min-id election over the full table) is the
 * convergence path: the periodic batch rebuild reconciles both
 * cross-batch election order and post-horizon repeats, exactly as the
 * rollup's lambda split does for late turns.
 */
object StreamingDedup {

  final case class DocIn(doc_id: Long, content_hash: String,
      ts: java.sql.Timestamp)

  final case class HashState(canonicalId: Long, seen: Long)

  final case class DedupedDoc(doc_id: Long, content_hash: String,
      is_duplicate: Boolean, canonical_id: Long, dup_index: Long)

  def dedup(docs: Dataset[DocIn],
      watermark: String = "10 minutes",
      stateTtl: String = "30min"): Dataset[DedupedDoc] = {
    import docs.sparkSession.implicits._
    val ttlMs = org.apache.spark.network.util.JavaUtils
      .timeStringAsMs(stateTtl)
    // captured as a plain Boolean — the Dataset itself must not leak
    // into the executor-side closure
    val streaming = docs.isStreaming

    def process(hash: String, it: Iterator[DocIn],
        state: GroupState[HashState]): Iterator[DedupedDoc] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val sorted = it.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
      var st = state.getOption.orNull
      val out = Seq.newBuilder[DedupedDoc]
      sorted.foreach { d =>
        if (st == null) {
          st = HashState(d.doc_id, 1L)
          out += DedupedDoc(d.doc_id, hash, is_duplicate = false,
            canonical_id = d.doc_id, dup_index = 0L)
        } else {
          out += DedupedDoc(d.doc_id, hash, is_duplicate = true,
            canonical_id = st.canonicalId, dup_index = st.seen)
          st = st.copy(seen = st.seen + 1L)
        }
      }
      state.update(st)
      if (streaming) {
        val wmMs = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(
          sorted.lastOption.map(_.ts.getTime + ttlMs).getOrElse(0L),
          wmMs + 60000L))
      }
      out.result().iterator
    }

    val base =
      if (docs.isStreaming) docs.withWatermark("ts", watermark) else docs
    base.groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process)
  }
}
