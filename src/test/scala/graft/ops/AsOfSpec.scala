package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("as-of join: latest at-or-before match, inclusive ts, null on none") {
    val probe = Seq(
      (100L, 1L, ts(50)),  // between builds 10 and 12
      (101L, 1L, ts(20)),  // EXACTLY at build 10's ts → inclusive
      (102L, 1L, ts(5)),   // before all builds → null
      (103L, 2L, ts(99)))  // other key: only build 20 visible
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, 1L, ts(20)),
      (12L, 1L, ts(60)),
      (20L, 2L, ts(30)),
      (21L, 3L, ts(1)))    // key never probed
      .toDF("event_id", "user_id", "ts")
    val got = AsOf.asOfLatest(probe, build, "user_id", "ts", "event_id",
        "ts", "event_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map(100L -> Some(10L), 101L -> Some(10L),
      102L -> None, 103L -> Some(20L)))
  }

  test("as-of join: ties on build ts keep the max build id") {
    val probe = Seq((100L, 1L, ts(50))).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 1L, ts(40)), (11L, 1L, ts(40)))
      .toDF("event_id", "user_id", "ts")
    val got = AsOf.asOfLatest(probe, build, "user_id", "ts", "event_id",
      "ts", "event_id").head()
    assert(got.getLong(2) == 11L)
  }

  test("as-of join: null probe keys / build nulls never match") {
    val probe = Seq(
      (100L, Some(1L), Some(ts(50))), // normal: matches build 10
      (101L, None, Some(ts(50))),     // null key → no match
      (102L, Some(1L), None))         // null ts → no match
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, Some(1L), Some(ts(20))),
      (11L, None, Some(ts(10))),      // null-key build: must never match
      (12L, Some(1L), None))          // null-ts build: must never match
      .toDF("event_id", "user_id", "ts")
    val got = AsOf.asOfLatest(probe, build, "user_id", "ts", "event_id",
        "ts", "event_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map(100L -> Some(10L), 101L -> None, 102L -> None))
  }

  test("as-of join with value carry equals a per-probe argmax") {
    val probe = Seq((100L, 1L, ts(50)), (101L, 1L, ts(10)))
      .toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 1L, ts(20), 7.5), (12L, 1L, ts(45), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.asOfLatestWith(probe, build, "user_id", "ts",
        "event_id", "ts", "event_id",
        org.apache.spark.sql.functions.col("value"), "click_value")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(100L -> Some(9.0), 101L -> None))
  }
}
