package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("session intervals + attribution: gaps split, containment lands") {
    val ev = Seq(
      (1L, 10L, ts(0), "click"),
      (2L, 10L, ts(1000), "purchase"),   // session 1 (gap < 30 min)
      (3L, 10L, ts(10000), "click"),     // 9000s gap → session 2
      (4L, 10L, ts(10100), "purchase"),
      (5L, 11L, ts(50), "purchase"))     // other user, own session
      .toDF("event_id", "user_id", "ts", "event_type")
    val sessions = Sessionize.sessionIntervals(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toMap
    assert(sessions((10L, 1L)) == ((ts(0), ts(1000), 2L)))
    assert(sessions((10L, 2L)) == ((ts(10000), ts(10100), 2L)))
    assert(sessions((11L, 1L)) == ((ts(50), ts(50), 1L)))

    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val attrib = Sessionize
      .attributeToSessions(purchases, Sessionize.sessionIntervals(ev))
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id"))
      .toMap
    // event_id → session_id: purchase 2 in session 1, 4 in session 2
    assert(attrib == Map(2L -> 1L, 4L -> 2L, 5L -> 1L))
  }

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

  test("funnelStages: in-order progress only, one advance per stage") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    val events = Seq(
      // user 1: full ordered funnel
      (1L, t(1), 101L, "view"), (1L, t(2), 102L, "click"),
      (1L, t(3), 103L, "purchase"),
      // user 2: click BEFORE view never counts; view alone -> stage 1
      (2L, t(1), 201L, "click"), (2L, t(2), 202L, "view"),
      // user 3: purchase without click can't skip -> stage 1
      (3L, t(1), 301L, "view"), (3L, t(2), 302L, "purchase"),
      // user 4: nothing relevant -> stage 0
      (4L, t(1), 401L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(3L -> (1L, 1L), 1L -> (2L, 2L + 3L), 0L -> (1L, 4L)))
  }

  test("funnelStages: a step name containing a quote parses and matches") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    // step strings are interpolated into a SQL CASE — unescaped, the
    // embedded quote was a plan-time ParseException
    val events = Seq(
      (1L, t(1), 101L, "view"), (1L, t(2), 102L, "o'reilly_promo"),
      (2L, t(1), 201L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events,
        steps = Seq("view", "o'reilly_promo")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 1L -> 1L),
      s"user 1 reaches the quoted stage, user 2 stalls at view: $got")
  }

  test("funnelStages: backslashes in step names parse and match exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    // Spark string literals process backslash escapes: unescaped, a
    // trailing backslash swallows the closing quote (ParseException) and
    // a literal "\n" becomes a newline that never matches its events
    val events = Seq(
      (1L, t(1), 101L, """path\to\promo"""), (1L, t(2), 102L, """end\"""),
      (2L, t(1), 201L, """a\nb"""))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events,
        steps = Seq("""path\to\promo""", """end\""", """a\nb"""))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 1 advances through both backslashed stages; user 2's first
    // event matches step 3 but steps must advance in order → stage 0
    assert(got == Map(2L -> 1L, 0L -> 1L), got.toString)
  }
}
