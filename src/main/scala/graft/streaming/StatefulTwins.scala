package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch per-key fold operators — st5 funnel,
  * st6 transitions, d1 exact dedup, st10 disorder audit, st15
  * last-touch attribution, st16 session funnel — following the
  * same pattern st1 already proves with Sessionize.sessionizeStream:
  * the batch spelling is a per-key fold over a totally-ordered event
  * history, so the streaming spelling is the SAME fold with the
  * accumulator held in GroupState across micro-batches.
  *
  * Ordering contract (shared with st1): events for one key arrive
  * in (ts_us, event_id) order ACROSS micro-batches (the watermark
  * assumption); within a batch they may arrive shuffled and are
  * sorted before the fold. Under that contract the emitted results
  * are row-identical to the batch operators — proven in
  * StreamingSpec on MemoryStream input.
  *
  * Scale: state is O(keys) and O(1) per key — three optional
  * timestamps for the funnel, one (ts, id, type) triple for
  * transitions. Nothing about a key's full history is retained, so
  * unlike the batch spelling (which needs a key's filtered history in
  * one task) the streaming twin has NO per-key-bounded-history
  * assumption — it is the fallback the Funnel scaladoc names for
  * unbounded keys, run continuously.
  */
object StatefulTwins {

  // ---------------------------------------------------------------- funnel

  final case class FunnelEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  final case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  final case class FunnelOut(user_id: Long, step1_ts_us: Option[Long],
                             step2_ts_us: Option[Long], step3_ts_us: Option[Long],
                             reached: Int)

  /** Streaming 3-step funnel: mapGroupsWithState keyed by user, the
    * exact step state machine of Funnel.funnel3 (strictly-after step
    * ordering), emitting each user's CURRENT funnel row every batch
    * (Update mode — the downstream sink upserts by user_id, the same
    * keyed-upsert contract p9/Streams.jdbcUpsertWriter document).
    */
  def funnelStream(events: Dataset[FunnelEv],
                   steps: (String, String, String)): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val (s1, s2, s3) = steps

    def fn(userId: Long, evs: Iterator[FunnelEv], state: GroupState[FunnelState]): FunnelOut = {
      var st = state.getOption.getOrElse(FunnelState(None, None, None))
      // in-batch reordering is repaired here; cross-batch order is the contract
      evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        st = FunnelState(
          if (st.t1.isEmpty && e.event_type == s1) Some(e.ts_us) else st.t1,
          if (st.t2.isEmpty && st.t1.nonEmpty && e.event_type == s2 && e.ts_us > st.t1.get) Some(e.ts_us) else st.t2,
          if (st.t3.isEmpty && st.t2.nonEmpty && e.event_type == s3 && e.ts_us > st.t2.get) Some(e.ts_us) else st.t3)
      }
      state.update(st)
      val reached = if (st.t3.nonEmpty) 3 else if (st.t2.nonEmpty) 2 else if (st.t1.nonEmpty) 1 else 0
      FunnelOut(userId, st.t1, st.t2, st.t3, reached)
    }

    events
      .filter(e => e.event_type == s1 || e.event_type == s2 || e.event_type == s3)
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ transitions

  final case class TransEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  final case class LastEv(ts_us: Long, event_id: Long, event_type: String)
  final case class TransPair(user_id: Long, from_type: String, to_type: String)

  /** Streaming transition-pair emission: flatMapGroupsWithState keyed
    * by user holding only the key's LAST event; each batch emits the
    * (from → to) pair for every consecutive step, including the seam
    * pair from the stored last event to the batch's first. Append
    * mode — pairs are immutable facts once emitted; the matrix
    * (count + probability over |types|² keys) is the same downstream
    * aggregation the batch operator runs, over an identical pair set.
    */
  def transitionPairsStream(events: Dataset[TransEv]): Dataset[TransPair] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[TransEv], state: GroupState[LastEv]): Iterator[TransPair] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[TransPair]
      var last = state.getOption
      sorted.foreach { e =>
        last.foreach(l => out += TransPair(userId, l.event_type, e.event_type))
        last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
      }
      state.update(last.get)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ---------------------------------------------------------- exact dedup

  final case class DocEv(doc_id: Long, content_hash: String)
  final case class DedupVerdict(doc_id: Long, content_hash: String,
                                keep_id: Long, is_dup: Boolean)

  /** Streaming twin of d1's exact dedup — the continuous-ingest
    * spelling of "which of the arriving documents are already in the
    * corpus" (the stream-shaped half of d10's nightly batch gate).
    * Keyed BY content hash, so per-key state is a single long (the
    * keeper id): the first arrival of a hash is the keeper, every
    * later arrival (same batch or any later one) is verdicted a dup
    * of it. Under the arrival contract that a hash's first occurrence
    * has its smallest doc_id (ids are assigned in ingest order, the
    * same monotonicity st1/st5/st6 assume for timestamps), the
    * verdicts are row-identical to batch d1. In-batch id order is
    * repaired by the per-batch sort; state never stores content, so
    * memory is O(distinct hashes) × O(1) regardless of how hot a
    * duplicate cluster runs.
    */
  def exactDedupStream(docs: Dataset[DocEv]): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._

    def fn(hash: String, evs: Iterator[DocEv], state: GroupState[Long]): Iterator[DedupVerdict] = {
      val sorted = evs.toSeq.sortBy(_.doc_id)
      if (sorted.isEmpty) return Iterator.empty
      val keeper = math.min(state.getOption.getOrElse(Long.MaxValue), sorted.head.doc_id)
      state.update(keeper)
      sorted.iterator.map(e =>
        DedupVerdict(e.doc_id, hash, keeper, e.doc_id != keeper))
    }

    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------- disorder audit

  final case class DisEv(user_id: Long, event_id: Long, ts_us: Long)
  final case class DisState(maxTs: Long, n: Long, nLate: Long, maxLate: Long)
  final case class DisOut(user_id: Long, n_events: Long, n_late: Long,
                          max_late_us: Long)

  /** Streaming twin of st10's disorder audit — lateness measured
    * CONTINUOUSLY, which is where the report actually belongs: the
    * deployment watching its own watermark headroom. State per key is
    * O(1) — the running event-time max plus three counters — and the
    * fold is st10's exactly: an event is late iff the stored max
    * (over everything that arrived before it) exceeds its event time.
    * Arrival order within a batch is repaired by the event_id sort
    * (the ingest sequence, d1's monotonicity contract); emits each
    * key's CURRENT audit row every batch (Update mode, keyed-upsert
    * sink contract).
    */
  def disorderAuditStream(events: Dataset[DisEv]): Dataset[DisOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[DisEv], state: GroupState[DisState]): DisOut = {
      var st = state.getOption.getOrElse(DisState(Long.MinValue, 0L, 0L, 0L))
      evs.toSeq.sortBy(_.event_id).foreach { e =>
        val late =
          if (st.maxTs != Long.MinValue && st.maxTs > e.ts_us) st.maxTs - e.ts_us
          else 0L
        st = DisState(math.max(st.maxTs, e.ts_us), st.n + 1,
          st.nLate + (if (late > 0) 1L else 0L), math.max(st.maxLate, late))
      }
      state.update(st)
      DisOut(userId, st.n, st.nLate, st.maxLate)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ streaks

  final case class StreakEv(user_id: Long, day: Int)
  final case class StreakOut(user_id: Long, active_days: Long, n_streaks: Long,
                             longest_streak: Long)

  /** Streaming twin of st19's activity streaks. State per key is the
    * DISTINCT active-day set (as epoch days) — bounded by the
    * calendar span of the stream, st19's own per-key contract, and
    * insertion-order-free, so out-of-order and duplicate days within
    * the watermark cannot corrupt a run the way an O(1) last-day
    * counter would (a day arriving late simply lands in the set; the
    * streak math re-derives from the sorted set). Emits each key's
    * CURRENT streak row every batch (Update mode, keyed-upsert sink).
    */
  def streaksStream(events: Dataset[StreakEv]): Dataset[StreakOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[StreakEv],
           state: GroupState[Seq[Int]]): StreakOut = {
      val days = (state.getOption.getOrElse(Seq.empty[Int]) ++
        evs.map(_.day)).distinct
      state.update(days)
      val sorted = days.toArray.sorted
      var prev = Int.MinValue
      var cur = 0L; var best = 0L; var runs = 0L
      sorted.foreach { d =>
        if (prev != Int.MinValue && d == prev + 1) cur += 1
        else { cur = 1; runs += 1 }
        if (cur > best) best = cur
        prev = d
      }
      StreakOut(userId, sorted.length.toLong, runs, best)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ attribution

  final case class AttribOut(event_id: Long, user_id: Long, ts_us: Long,
                             touch_event_id: Option[Long], touch_type: Option[String],
                             touch_ts_us: Option[Long], attributed: Boolean,
                             touch_age_us: Option[Long])

  /** Streaming twin of st15's last-touch attribution — the shape a
    * live marketing pipeline actually runs: conversions must be
    * credited as they arrive, not in a nightly window job. State per
    * key is O(1) — the latest touch triple — and the fold is the
    * batch window's exactly: a conversion credits the latest touch
    * STRICTLY preceding it in (ts_us, event_id) order, so a same-
    * batch touch→conversion pair still attributes and a conversion
    * that lands before any touch emits unattributed with null credit
    * (never dropped). Append mode: each conversion emits exactly
    * once, in the batch it arrives.
    */
  def attributionStream(events: Dataset[FunnelEv],
                        conversionType: String = "purchase",
                        touchTypes: Set[String] = Set("click", "view")): Dataset[AttribOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[FunnelEv],
           state: GroupState[LastEv]): Iterator[AttribOut] = {
      var touch = state.getOption
      val out = scala.collection.mutable.ListBuffer.empty[AttribOut]
      evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.event_type == conversionType)
          out += AttribOut(e.event_id, userId, e.ts_us,
            touch.map(_.event_id), touch.map(_.event_type), touch.map(_.ts_us),
            touch.nonEmpty, touch.map(t => e.ts_us - t.ts_us))
        if (touchTypes(e.event_type)) touch = Some(LastEv(e.ts_us, e.event_id, e.event_type))
      }
      touch.foreach(state.update)
      out.iterator
    }

    events
      .filter(e => e.event_type == conversionType || touchTypes(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // --------------------------------------------------------- session funnel

  final case class SessFunnelState(seq: Long, lastTs: Long, hasStep: Boolean,
                                   t1: Option[Long], t2: Option[Long], t3: Option[Long])
  final case class SessFunnelOut(user_id: Long, session_seq: Long,
                                 step1_ts_us: Option[Long], step2_ts_us: Option[Long],
                                 step3_ts_us: Option[Long], reached: Int)

  /** Streaming twin of st16's session-scoped funnel: st1's gap law
    * and st5's step machine in ONE state fold. Sessions are cut on
    * ALL event types (filtering first would move boundaries — the
    * batch operator's rule), the step machine consumes only the
    * three step types, and a gap CLOSES the current session's funnel
    * row for good. State per key is O(1): the running session
    * ordinal, the last event time, and the open session's three step
    * timestamps — no history. Like the batch operator (whose funnel
    * fold only ever sees step-type events), a session emits a row
    * only if it contains at least one step-type event — gap-cutting
    * still consumes every event. Emits, per batch, a final row for
    * each session the batch closed plus the open session's current
    * row
    * (Update mode — downstream upserts by (user_id, session_seq),
    * so closed rows freeze and the open row converges to the batch
    * result).
    */
  def sessionFunnelStream(events: Dataset[FunnelEv],
                          gapMinutes: Int = 30,
                          steps: (String, String, String) = ("view", "click", "purchase")): Dataset[SessFunnelOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val (s1, s2, s3) = steps

    def row(userId: Long, st: SessFunnelState): SessFunnelOut = {
      val reached = if (st.t3.nonEmpty) 3 else if (st.t2.nonEmpty) 2
                    else if (st.t1.nonEmpty) 1 else 0
      SessFunnelOut(userId, st.seq, st.t1, st.t2, st.t3, reached)
    }

    def fn(userId: Long, evs: Iterator[FunnelEv],
           state: GroupState[SessFunnelState]): Iterator[SessFunnelOut] = {
      var st = state.getOption.orNull
      val out = scala.collection.mutable.ListBuffer.empty[SessFunnelOut]
      evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        st =
          if (st == null) SessFunnelState(1L, e.ts_us, hasStep = false, None, None, None)
          else if (e.ts_us - st.lastTs > gapUs) {
            // gap: the old session's row is final (if it has steps)
            if (st.hasStep) out += row(userId, st)
            SessFunnelState(st.seq + 1, e.ts_us, hasStep = false, None, None, None)
          } else st.copy(lastTs = e.ts_us)
        val isStep = e.event_type == s1 || e.event_type == s2 || e.event_type == s3
        st = st.copy(
          hasStep = st.hasStep || isStep,
          t1 = if (st.t1.isEmpty && e.event_type == s1) Some(e.ts_us) else st.t1,
          t2 = if (st.t2.isEmpty && st.t1.nonEmpty && e.event_type == s2 &&
            e.ts_us > st.t1.get) Some(e.ts_us) else st.t2,
          t3 = if (st.t3.isEmpty && st.t2.nonEmpty && e.event_type == s3 &&
            e.ts_us > st.t2.get) Some(e.ts_us) else st.t3)
      }
      if (st != null) { state.update(st); if (st.hasStep) out += row(userId, st) }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(fn)
  }

  // -------------------------------------------------------- interval merge

  final case class IvEv(user_id: Long, start_us: Long, end_us: Long, event_id: Long)
  final case class IslState(seq: Long, start: Long, maxEnd: Long, n: Long)
  final case class Island(user_id: Long, island_seq: Long, island_start: Long,
                          island_end: Long, n_intervals: Long, covered_us: Long)

  /** Streaming twin of st17's interval merge: per-key state is ONLY
    * the currently-open island (start, running max end, count, seq).
    * An arriving interval extends it (start <= maxEnd, the
    * closed-interval law) or closes it — a closed island is final
    * and emits append-mode (a later interval can never reopen it,
    * because arrival order is the same (start, end, id) order the
    * batch fold uses). The open island stays in state unemitted —
    * exactly st1's gap law: streaming can only close on gap
    * evidence. O(1) state per key, no history.
    */
  def intervalMergeStream(ivs: Dataset[IvEv]): Dataset[Island] = {
    import ivs.sparkSession.implicits._

    def close(userId: Long, st: IslState): Island =
      Island(userId, st.seq, st.start, st.maxEnd, st.n, st.maxEnd - st.start)

    def fn(userId: Long, evs: Iterator[IvEv], state: GroupState[IslState]): Iterator[Island] = {
      val sorted = evs.toSeq.sortBy(e => (e.start_us, e.end_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[Island]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        st =
          if (st == null) IslState(1L, e.start_us, e.end_us, 1L)
          else if (e.start_us > st.maxEnd) {
            out += close(userId, st)
            IslState(st.seq + 1, e.start_us, e.end_us, 1L)
          } else IslState(st.seq, st.start, math.max(st.maxEnd, e.end_us), st.n + 1)
      }
      state.update(st)
      out.result().iterator
    }

    ivs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ dwell time

  final case class DwellEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  final case class DwellCredit(user_id: Long, state: String, dwell_us: Long)

  /** Streaming twin of st18's dwell fold: state is the key's LAST
    * (ts, id, type); each arriving event emits the dwell credit the
    * PRIOR event just earned (its state, next.ts − its.ts) — append
    * mode, credits are immutable facts. A key's terminal event sits
    * in state unemitted, which is exactly the batch law (terminal
    * dwell is right-censored, never zero). The per-state aggregation
    * downstream is the same tiny-key agg the batch operator runs,
    * over an identical credit multiset.
    */
  def dwellCreditsStream(events: Dataset[DwellEv]): Dataset[DwellCredit] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[DwellEv], state: GroupState[LastEv]): Iterator[DwellCredit] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[DwellCredit]
      var last = state.getOption
      sorted.foreach { e =>
        last.foreach(l => out += DwellCredit(userId, l.event_type, e.ts_us - l.ts_us))
        last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
      }
      state.update(last.get)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ LOCF resample

  final case class LocfEv(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  final case class LocfState(openSlot: Long, openValue: Double,
                             lastTs: Long, lastId: Long)
  final case class GridSlot(user_id: Long, grid_slot: Long,
                            filled_value: Double, is_observed: Boolean)

  /** Streaming twin of st7's grid LOCF (Resample.locfResample): state
    * is ONLY the key's open slot — its latest (ts, id)-winning value.
    * An observation landing in the open slot refines it in place; an
    * observation in a LATER slot closes it (append-emit), emits the
    * carried-forward gap slots between them (is_observed = false,
    * filled with the closed slot's value — closed too, because a
    * later observation now bounds them), and opens the new slot. The
    * key's last observed slot stays open unemitted: a next batch
    * could still bring a later observation inside it (st1's gap law —
    * no close without evidence beyond the slot).
    *
    * O(1) state per key vs the batch spelling's per-key span window;
    * this is the continuous form of the same fold, so the emitted
    * rows are exactly the batch grid minus each key's final (still
    * open) slot — proven in StreamingSpec.
    */
  def locfResampleStream(obs: Dataset[LocfEv], gridUs: Long): Dataset[GridSlot] = {
    import obs.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[LocfEv],
           state: GroupState[LocfState]): Iterator[GridSlot] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[GridSlot]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        val s = Math.floorDiv(e.ts_us, gridUs)
        if (st == null) st = LocfState(s, e.value, e.ts_us, e.event_id)
        else if (s == st.openSlot) {
          // same slot: (ts, id) winner refines the open fill — the
          // batch row_number((ts desc, id desc)) law
          if (e.ts_us > st.lastTs || (e.ts_us == st.lastTs && e.event_id > st.lastId))
            st = LocfState(s, e.value, e.ts_us, e.event_id)
        } else if (s > st.openSlot) {
          out += GridSlot(userId, st.openSlot, st.openValue, is_observed = true)
          var g = st.openSlot + 1
          while (g < s) {
            out += GridSlot(userId, g, st.openValue, is_observed = false)
            g += 1
          }
          st = LocfState(s, e.value, e.ts_us, e.event_id)
        }
        // s < openSlot: late beyond the ordering contract — dropped,
        // the same row a watermarked stream would discard
      }
      state.update(st)
      out.result().iterator
    }

    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------ debounce

  final case class DebEv(user_id: Long, event_type: String, event_id: Long,
                         ts_us: Long)
  final case class DebRun(leadId: Long, leadTs: Long, n: Long, lastTs: Long)
  final case class DebOut(user_id: Long, event_type: String, event_id: Long,
                          ts_us: Long, n_suppressed: Long, span_us: Long)

  /** Streaming twin of st30's debounce (Activity.debounce): state per
    * (user, type) is the OPEN run — its lead event, how many repeats
    * it has absorbed, and the last timestamp seen. An arrival within
    * `gapUs` of the last one extends the run; an arrival beyond it
    * CLOSES the run (append-emit with its suppressed count and span)
    * and opens a new one on the arrival. The final run per key stays
    * open unemitted (st17's island law: a closing needs gap evidence)
    * — so the emitted rows are exactly the batch output minus each
    * (user, type)'s last run, proven in StreamingSpec. O(1) state per
    * key; this per-arrival update is the batch lag-gap fold applied
    * eventwise.
    */
  def debounceStream(events: Dataset[DebEv], gapUs: Long): Dataset[DebOut] = {
    import events.sparkSession.implicits._

    def fn(key: (Long, String), evs: Iterator[DebEv],
           state: GroupState[DebRun]): Iterator[DebOut] = {
      val (uid, etype) = key
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[DebOut]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        if (st == null) st = DebRun(e.event_id, e.ts_us, 1L, e.ts_us)
        else if (e.ts_us - st.lastTs > gapUs) {
          out += DebOut(uid, etype, st.leadId, st.leadTs,
            st.n - 1L, st.lastTs - st.leadTs)
          st = DebRun(e.event_id, e.ts_us, 1L, e.ts_us)
        } else {
          // within the gap (or the same instant): a repeat — the
          // in-order contract guarantees e.ts_us >= lastTs here
          st = DebRun(st.leadId, st.leadTs, st.n + 1L,
            math.max(st.lastTs, e.ts_us))
        }
      }
      state.update(st)
      out.result().iterator
    }

    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  // ------------------------------------------------------------- EWMA state

  final case class EwmaEv(user_id: Long, ts_us: Long, event_id: Long, v_e6: Long)
  final case class EwmaState(n: Long, lastTs: Long, lastId: Long,
                             lastV: Long, ewma: Long)
  final case class EwmaOut(user_id: Long, n_obs: Long, last_v_e6: Long,
                           ewma_e6: Long, lag_e6: Long)

  /** Streaming twin of st29's integer EWMA (Activity.ewmaState): the
    * per-key state IS the smoother — (count, last (ts, id), last raw
    * value, smoothed value) — updated with the identical exact
    * recursion (Math.floorDiv = the batch pmod floor), emitting each
    * key's CURRENT row every batch (Update mode, the keyed-upsert
    * sink contract funnelStream documents). The batch fold over the
    * sorted series and this per-arrival update are literally the
    * same computation — the fold's step function applied eventwise —
    * so after any in-order ingest the final upserted row per key
    * equals batch st29 exactly (StreamingSpec). In-batch disorder is
    * repaired by the sort; an arrival at or before the state's
    * (ts, id) is late beyond the ordering contract and drops.
    */
  def ewmaStream(events: Dataset[EwmaEv], shift: Int = 2): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val m = 1L << shift

    def fn(userId: Long, evs: Iterator[EwmaEv],
           state: GroupState[EwmaState]): EwmaOut = {
      var st = state.getOption.orNull
      evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (st == null)
          st = EwmaState(1L, e.ts_us, e.event_id, e.v_e6, e.v_e6)
        else if (e.ts_us > st.lastTs ||
                 (e.ts_us == st.lastTs && e.event_id > st.lastId))
          st = EwmaState(st.n + 1L, e.ts_us, e.event_id, e.v_e6,
            st.ewma + Math.floorDiv(e.v_e6 - st.ewma, m))
      }
      state.update(st)
      EwmaOut(userId, st.n, st.lastV, st.ewma, st.lastV - st.ewma)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  // -------------------------------------------------- linear-interp resample

  final case class LinEv(user_id: Long, ts_us: Long, event_id: Long, v_e6: Long)
  final case class LinState(lastTs: Long, lastWinVal: Long, lastWinId: Long)
  final case class LinSlot(user_id: Long, grid_slot: Long,
                           interp_e6: Long, bracket_us: Long)

  /** Streaming twin of st28's linear interpolation
    * (Resample.linearResample): state is ONLY the key's latest
    * observation — its (ts, max-event_id-winner value). A new
    * observation at a LATER ts closes everything it brackets: the
    * pending exact-hit at the state's own ts (if it sits on the
    * grid — its value was final, but its `bracket_us` needed this
    * arrival), then every interior grid point strictly between the
    * two timestamps, interpolated with the batch spelling's exact
    * integer arithmetic (the same sign-restored half-away division,
    * on BigInt so diff·num cannot overflow). An equal-ts observation
    * only refines the winner (batch's max-id tiebreak); the interior
    * next-side uses the FIRST (min-id) value at the new ts — which
    * in (ts, id)-sorted processing is exactly the arrival that
    * triggers the emission, so both bracket conventions match the
    * batch windows by construction.
    *
    * The key's latest timestamp stays open unemitted (its exact-hit
    * has no bracket yet) — so the emitted rows are exactly the batch
    * output MINUS the rows batch marks `bracket_us IS NULL`: the
    * open-slot law falls out of the schema itself. O(1) state per
    * key; proven in StreamingSpec.
    */
  def linearResampleStream(obs: Dataset[LinEv], gridUs: Long): Dataset[LinSlot] = {
    import obs.sparkSession.implicits._

    def interp(prevTs: Long, prevV: Long, nextTs: Long, nextV: Long,
               tau: Long): Long = {
      val den = nextTs - prevTs
      val diff = BigInt(nextV) - BigInt(prevV)
      val num = BigInt(tau - prevTs)
      val q = (2 * (diff * num).abs + den) / (2 * BigInt(den))
      (BigInt(prevV) + diff.signum * q).toLong
    }

    def fn(userId: Long, evs: Iterator[LinEv],
           state: GroupState[LinState]): Iterator[LinSlot] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[LinSlot]
      var st = state.getOption.orNull
      sorted.foreach { e =>
        if (st == null) st = LinState(e.ts_us, e.v_e6, e.event_id)
        else if (e.ts_us == st.lastTs) {
          // same instant: max-id winner refines the stored value —
          // the batch prev-window tiebreak
          if (e.event_id > st.lastWinId) st = LinState(e.ts_us, e.v_e6, e.event_id)
        } else if (e.ts_us > st.lastTs) {
          // the pending exact-hit at the state's ts gains its bracket
          if (st.lastTs % gridUs == 0)
            out += LinSlot(userId, st.lastTs / gridUs, st.lastWinVal,
              e.ts_us - st.lastTs)
          // interior grid points are now double-bracketed and final
          var s = Math.floorDiv(st.lastTs, gridUs) + 1
          while (s * gridUs < e.ts_us) {
            out += LinSlot(userId, s,
              interp(st.lastTs, st.lastWinVal, e.ts_us, e.v_e6, s * gridUs),
              e.ts_us - st.lastTs)
            s += 1
          }
          st = LinState(e.ts_us, e.v_e6, e.event_id)
        }
        // e.ts < lastTs: late beyond the ordering contract — dropped,
        // the same row a watermarked stream would discard
      }
      state.update(st)
      out.result().iterator
    }

    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }
}
