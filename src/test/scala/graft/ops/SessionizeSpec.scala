package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("rolling trailing-window stats: RANGE frame includes by time") {
    val ev = Seq(
      (1L, 10L, ts(0)),     // window start boundary case below
      (2L, 10L, ts(1800)),
      (3L, 10L, ts(3600)),  // exactly 1h after id 1 → id 1 still inside
      (4L, 10L, ts(7201)),  // 3601s after id 3 → alone
      (5L, 11L, ts(3600)))  // other user: own partition
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.rollingUserStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((1L, 1L)),
      2L -> ((2L, 3L)),
      3L -> ((3L, 6L)),
      4L -> ((1L, 4L)),
      5L -> ((1L, 5L))))
  }
}
