package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Event, UserUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState: per-user state must accumulate across
  * micro-batches (the arbitrary-state operator, SURVEY §2.5). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("stateful running totals accumulate across batches") {
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val input = MemoryStream[Event]
    val query = StatefulOps
      .runningTotals(input.toDS())
      .writeStream
      .format("memory")
      .queryName("graft_state_test")
      .outputMode(OutputMode.Update())
      .start()

    input.addData(Event(1, 10.0), Event(1, 5.0), Event(2, 1.0))
    query.processAllAvailable()
    input.addData(Event(1, 2.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark
      .table("graft_state_test")
      .collect()
      .map(r => UserUpdate(r.getLong(0), r.getLong(1), r.getDouble(2)))
    // last update per user wins
    val last = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.last }
    assert(last(1L) === UserUpdate(1, 3, 17.0))
    assert(last(2L) === UserUpdate(2, 1, 1.0))
  }
}
