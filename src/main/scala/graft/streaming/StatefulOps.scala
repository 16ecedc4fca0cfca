package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful stream processing — the Structured Streaming
  * equivalent of a keyed state machine: per-user running count and
  * running value sum maintained in GroupState across micro-batches.
  * Spec-tested with a MemoryStream (StreamingSpec); not SQL-expressible,
  * so no driver oracle entry.
  */
object StatefulOps {

  final case class Event(user_id: Long, value: Double)
  final case class UserState(n: Long, total: Double)
  final case class UserUpdate(user_id: Long, n: Long, total: Double)

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
