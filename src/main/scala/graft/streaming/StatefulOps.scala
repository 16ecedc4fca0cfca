package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
