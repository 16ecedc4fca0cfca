package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful stream processing — the Structured Streaming
  * equivalent of a keyed state machine: per-user running count and
  * running value sum maintained in GroupState across micro-batches.
  * Spec-tested with a MemoryStream (StreamingSpec). The intermediate
  * update stream is not SQL-expressible, but the FINAL state per key is
  * a plain aggregation — stream_state_running drives the micros variant
  * below through a real stream and oracle-checks that final state.
  */
object StatefulOps {

  final case class Event(user_id: Long, value: Double)
  final case class UserState(n: Long, total: Double)
  final case class UserUpdate(user_id: Long, n: Long, total: Double)

  final case class EventM(user_id: Long, v_micros: Long)
  final case class StateM(n: Long, total_micros: Long)
  final case class UpdateM(user_id: Long, n: Long, total_micros: Long)

  /** Exact-integer running totals: values pre-quantized to micro-units
    * so the accumulated state is BIGINT in both engines (the double
    * variant below keeps the classic shape; floats across engines don't
    * hash-match, integers do). Emits one update per key per batch. */
  def runningMicros(events: Dataset[EventM]): Dataset[UpdateM] = {
    implicit val stateEnc = Encoders.product[StateM]
    implicit val outEnc = Encoders.product[UpdateM]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (user: Long, batch: Iterator[EventM], state: GroupState[StateM]) => {
          val prev = state.getOption.getOrElse(StateM(0L, 0L))
          val (n, total) = batch.foldLeft((prev.n, prev.total_micros)) {
            case ((c, t), e) => (c + 1, t + e.v_micros)
          }
          state.update(StateM(n, total))
          Iterator.single(UpdateM(user, n, total))
        })
  }

  /** [[runningMicros]] re-expressed on `transformWithState` — Spark 4's
    * production arbitrary-state API (named typed state handles from a
    * processor handle, per-state TTL config, timer support) and the one
    * that REQUIRES the RocksDB state store provider — the disk-spilling
    * store 100 TB keyed state deploys on. Semantics identical to the
    * GroupState twin: one exact-integer running (n, total) per user,
    * one update emitted per key per batch; stream_state_tws pins
    * output equality against stream_state_running's oracle. */
  final class RunningMicrosProcessor extends StatefulProcessor[Long, EventM, UpdateM] {
    @transient private var st: ValueState[StateM] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StateM]("running", Encoders.product[StateM], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[EventM],
        timerValues: TimerValues): Iterator[UpdateM] = {
      val prev = if (st.exists()) st.get() else StateM(0L, 0L)
      val (n, total) = rows.foldLeft((prev.n, prev.total_micros)) {
        case ((c, t), e) => (c + 1, t + e.v_micros)
      }
      st.update(StateM(n, total))
      Iterator.single(UpdateM(user, n, total))
    }
  }

  def runningMicrosTws(events: Dataset[EventM]): Dataset[UpdateM] = {
    implicit val outEnc = Encoders.product[UpdateM]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningMicrosProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class EventZ(user_id: Long, event_id: Long, us: Long, v: Long)
  final case class StateZ(n: Long, s: Long, q: Long)
  final case class AnomalyZ(user_id: Long, event_id: Long, v: Long, n_prior: Long)

  /** Streaming z-score anomaly detection: per-user prefix moments
    * (count, Σv, Σv²) in exact centi-unit integers carried in
    * GroupState; an event is anomalous when its squared deviation from
    * the PRIOR running mean exceeds k²σ² (population), i.e.
    * (v·n − S)² > k²·(n·Q − S²) — the float-free cross-multiplied form,
    * so both engines decide every boundary identically. Events are
    * processed in (event-time, id) order inside each group batch
    * (prefix stats are then split-invariant given time-ordered
    * arrival); the comparison products run in BigInt — n·Q outgrows
    * BIGINT around sf≥10 while the STATE stays comfortably Long.
    * Warm-up: the first `minN` events of a user are never flagged. */
  def zscoreAnomalies(
      events: Dataset[EventZ],
      minN: Long = 30L,
      k2: Long = 9L): Dataset[AnomalyZ] = {
    implicit val stateEnc = Encoders.product[StateZ]
    implicit val outEnc = Encoders.product[AnomalyZ]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, batch: Iterator[EventZ], state: GroupState[StateZ]) => {
          var st = state.getOption.getOrElse(StateZ(0L, 0L, 0L))
          val out = Vector.newBuilder[AnomalyZ]
          for (e <- batch.toArray.sortBy(e => (e.us, e.event_id))) {
            if (st.n >= minN) {
              val lhs = (BigInt(e.v) * st.n - st.s).pow(2)
              val rhs = k2 * (BigInt(st.n) * st.q - BigInt(st.s) * st.s)
              if (lhs > rhs) out += AnomalyZ(user, e.event_id, e.v, st.n)
            }
            st = StateZ(st.n + 1, st.s + e.v, st.q + e.v * e.v)
          }
          state.update(st)
          out.result().iterator
        })
  }

  final case class DocIn(digest: String, doc_id: Long, lang: String, nw: Long)
  final case class KeptDoc(doc_id: Long, lang: String, nw: Long)

  /** Online corpus admission gate — the stateful half of
    * stream_curation_gate: documents arrive digest-keyed (quality
    * filtering already applied upstream as stateless column exprs);
    * the FIRST document to claim a digest is admitted, every later
    * copy — same batch or any later one — is dropped. State per
    * digest is a single boolean, the streaming twin of the batch
    * keep-min-doc_id rule: within a batch the group iterator is
    * reduced by min(doc_id), across batches first-arrival wins (the
    * catalog query stages one batch, so the two rules coincide and
    * the DuckDB oracle is exact; the cross-batch drop is
    * spec-asserted with a MemoryStream). */
  def curationGate(docs: Dataset[DocIn]): Dataset[KeptDoc] = {
    implicit val stateEnc = Encoders.scalaBoolean
    implicit val outEnc = Encoders.product[KeptDoc]
    implicit val keyEnc = Encoders.STRING
    docs
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, batch: Iterator[DocIn], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            val first = batch.minBy(_.doc_id)
            state.update(true)
            Iterator.single(KeptDoc(first.doc_id, first.lang, first.nw))
          }
        })
  }

  final case class CdcRow(k: Long, op: String, seq: Long, p_cents: Long)
  final case class CdcState(op: String, seq: Long, p_cents: Long)
  final case class CdcOut(k: Long, last_op: String, seq: Long, p_cents: Long)

  /** Streaming CDC apply — rel_cdc_apply's state machine: per-key
    * GroupState holds the max-seq (op, payload) seen so far; each batch
    * folds its rows in and emits the key's current final state. The
    * fold is max-by-seq, so the result is independent of how the log
    * splits into micro-batches (the split-invariance a replayed/
    * re-partitioned CDC feed demands) — the stream twin's spec feeds
    * inserts, updates, and deletes as THREE ordered micro-batches and
    * the final states must still equal the batch operator's. Keys whose
    * final op is D are filtered by the consumer (a delete is state too:
    * it must survive in state to suppress late lower-seq rows). */
  def cdcApply(log: Dataset[CdcRow]): Dataset[CdcOut] = {
    implicit val stateEnc = Encoders.product[CdcState]
    implicit val outEnc = Encoders.product[CdcOut]
    implicit val keyEnc = Encoders.scalaLong
    log
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, batch: Iterator[CdcRow], state: GroupState[CdcState]) => {
          val prev = state.getOption.map(s => CdcRow(k, s.op, s.seq, s.p_cents))
          val best = (prev.iterator ++ batch).maxBy(_.seq)
          state.update(CdcState(best.op, best.seq, best.p_cents))
          Iterator.single(CdcOut(k, best.op, best.seq, best.p_cents))
        })
  }

  final case class WinCount(wstart_s: Long, user_id: Long, n: Long)
  final case class TopkRow(wstart_s: Long, rank: Long, user_id: Long, n: Long)

  /** Window-keyed bounded top-k reduction over per-(window, user)
    * FINAL counts — stage 2 of the windowed-top-k decomposition (the
    * r8 verdict's state-shape fix). Stage 1 is the ordinary
    * distributed append-mode windowed count: its state is keyed by
    * (window, user) — O(1) per key, partial-aggregated map-side,
    * spread across all state partitions — and append-mode eviction
    * emits EVERY final of a window in the single micro-batch whose
    * watermark passes the window end (WatermarkSupport's eviction
    * predicate is per-key `window.end <= wm`, so the whole window
    * evicts atomically). This stage therefore sees one complete group
    * per closed window and reduces it with a SIZE-k BOUNDED fold —
    * O(k) transient memory per group, ZERO retained state (no
    * state.update ever runs; a per-window user map never exists
    * anywhere). The predecessor kept the whole window's user→count
    * map as ONE GroupState value on one executor — at 100 TB
    * (millions of users per hour window) a multi-GB single state
    * value; after the reshape the same query's largest state object
    * is one (window, user, count) row.
    *
    * Emission contract is unchanged: a window's top-k appears exactly
    * once, when no more events can legally join it; windows the final
    * watermark has not closed sit in stage-1 state as the unemitted
    * tail. */
  def topkReduce(counts: Dataset[WinCount], k: Int): Dataset[TopkRow] = {
    implicit val outEnc = Encoders.product[TopkRow]
    implicit val keyEnc = Encoders.scalaLong
    counts
      .groupByKey(_.wstart_s)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (wstart: Long, rows: Iterator[WinCount], state: GroupState[Long]) => {
          // bounded best-k fold: ordering (n DESC, user ASC), evict the
          // current worst when past k — the iterator streams through,
          // memory never exceeds k+1 entries
          val best = scala.collection.mutable.TreeSet
            .empty[(Long, Long)](Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
          rows.foreach { r =>
            best += ((r.n, r.user_id))
            if (best.size > k) best -= best.last
          }
          best.toSeq.zipWithIndex.iterator.map { case ((n, user), i) =>
            TopkRow(wstart, (i + 1).toLong, user, n)
          }
        })
  }

  def runningTotals(events: Dataset[Event]): Dataset[UserUpdate] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserUpdate]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (user: Long, batch: Iterator[Event], state: GroupState[UserState]) => {
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val (n, total) = batch.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          state.update(UserState(n, total))
          Iterator.single(UserUpdate(user, n, total))
        })
  }
}
