package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sessionize
import graft.operators.Sessionize.Ev

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("batch gaps-and-islands: sessions split at the gap") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, t(0), 1.0), (1L, 2L, t(5), 2.0),   // session 1
      (1L, 3L, t(50), 3.0),                        // session 2 (gap 45min)
      (2L, 4L, t(10), 4.0)                         // user 2, one session
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Sessionize.sessions(events, gapSeconds = 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming flatMapGroupsWithState agrees with batch on closed sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // user 1: two events then a long gap then another event; advancing
    // the watermark far enough times out and closes session 1
    mem.addData(Ev(1L, 1L, t(0), 1.0), Ev(1L, 2L, t(5), 2.0))
    q.processAllAvailable()
    mem.addData(Ev(1L, 3L, Timestamp.valueOf("2026-01-01 12:00:00"), 3.0))
    q.processAllAvailable()
    mem.addData(Ev(2L, 9L, Timestamp.valueOf("2026-01-01 14:00:00"), 9.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").collect()
    q.stop()
    assert(closed.length >= 1)
    val s1 = closed.minBy(_.getAs[Timestamp]("session_start").getTime)
    assert(s1.getAs[Long]("user_id") == 1L)
    assert(s1.getAs[Long]("n_events") == 2 && s1.getAs[Double]("sum_value") == 3.0)
    assert(s1.getAs[Timestamp]("session_end") == t(5))
  }
}
