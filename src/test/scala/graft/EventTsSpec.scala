package graft

import org.apache.spark.sql.functions._

/** Pins the round-8 failure mode: the driver's testdata has shipped
  * `events.ts` as both TIMESTAMP(NANOS) footers (surfacing as a LONG of
  * nanos under `nanosAsLong`) and plain TIMESTAMP(MICROS)
  * (TIMESTAMP_NTZ). `Tables.normalizeEventTs` is the ONE shared branch
  * that must map both to identical UTC micro timestamps — batch and
  * stream read paths both call it, so these equalities protect both. */
class EventTsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeEventTs: nanos-long and micros-ntz inputs unify") {
    // off-millisecond micros exercise the div-1000 floor exactly
    val micros = Seq(0L, 1L, 999L, 1000L, 1001L, 1696118400123456L,
      7L * 3600L * 1000000L + 123L)
    val asNanos = micros.map(us => us * 1000L).toDF("ts")
    val asNtz = micros.toDF("us")
      .select(expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)").as("ts"))
    assert(asNanos.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(asNtz.schema("ts").dataType.typeName === "timestamp_ntz")
    val a = Tables.normalizeEventTs(asNanos)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    val b = Tables.normalizeEventTs(asNtz)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(a === micros)
    assert(b === micros)
    // both outputs are the session-zone TIMESTAMP type
    assert(Tables.normalizeEventTs(asNanos).schema("ts").dataType.typeName
      === "timestamp")
    assert(Tables.normalizeEventTs(asNtz).schema("ts").dataType.typeName
      === "timestamp")
  }

  test("sub-microsecond nanos floor like the DuckDB oracle") {
    // 1999 ns → 1 µs (floor), matching duckdb's epoch truncation
    val df = Seq(1999L, 2000L, 2001L).toDF("ts")
    val got = Tables.normalizeEventTs(df)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 2L))
  }
}
