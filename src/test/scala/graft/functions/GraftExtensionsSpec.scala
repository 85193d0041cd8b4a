package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions run the native kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT capwords('hello  spark WORLD') AS c, " +
        "nfc_normalize('é') AS n, " +
        "poly_hash('abc') AS p, " +
        "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    // winnow_fps: defaults (k=4, w=5) and explicit args agree with the
    // Column-API path on a doc long enough to select several fps
    val text = "the quick brown fox jumps over the lazy dog"
    val sqlFps = spark.sql(
      s"SELECT winnow_fps('$text') AS f, winnow_fps('$text', 4, 5) AS g")
      .head()
    assert(sqlFps.getSeq[Long](0) == sqlFps.getSeq[Long](1))
    import org.apache.spark.sql.functions.lit
    val colFps = spark.range(1)
      .select(GraftFunctions.winnowFps(lit(text), 4, 5))
      .head().getSeq[Long](0)
    assert(sqlFps.getSeq[Long](0) == colFps && colFps.nonEmpty)
    assert(r.getString(0) == "Hello Spark World")
    assert(r.getString(1) == "é") // é composed
    // ((0*31+97)%P *31+98)%P *31+99 %P
    assert(r.getLong(2) ==
      ((97L * 31 + 98) * 31 + 99) % 2147483647L)
    assert(r.getDouble(3) == 11.0d)
    // SQL-path results equal the Column-API path
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaCol = Seq("mixed CASE words").toDF("s")
      .select(GraftFunctions.capwords(col("s"))).head().getString(0)
    val viaSql = spark.sql("SELECT capwords('mixed CASE words')")
      .head().getString(0)
    assert(viaCol == viaSql && viaSql == "Mixed Case Words")
  }

  test("extension class injects the same registry entries") {
    // the builder-time path: a fresh session with the extensions applied
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the shared session (same context); the
      // registered names must resolve either way
      GraftExtensions.register(s2)
      assert(s2.sql("SELECT poly_hash2('x') AS h").head().getLong(0) ==
        StringAlgos.polyHash2(
          org.apache.spark.unsafe.types.UTF8String.fromString("x")))
    } finally ()
  }

  test("winnow_fps k/w literals: over-Int-range longs error instead of " +
      "silently truncating") {
    GraftExtensions.register(spark)
    // 4294967301 = 2^32 + 5: a bare .toInt would truncate it to 5 and
    // sail past the k >= 1 guard with a silently-changed parameter
    val over = intercept[Exception] {
      spark.sql("SELECT winnow_fps('abcdefgh', 4294967301)").collect()
    }
    assert(over.getMessage.contains("[1, 2147483647]"),
      s"over-range literal must name the accepted range: ${over.getMessage}")
    val zero = intercept[Exception] {
      spark.sql("SELECT winnow_fps('abcdefgh', 0)").collect()
    }
    assert(zero.getMessage.contains("[1, 2147483647]"),
      s"non-positive literal must be rejected: ${zero.getMessage}")
    // in-range literals still work
    assert(spark.sql("SELECT winnow_fps('abcdefgh', 4, 5) AS f")
      .head().getSeq[Long](0).nonEmpty)
  }

  test("no registered name shadows a Spark built-in") {
    GraftExtensions.names.foreach { n =>
      assert(!GraftExtensions.shadowsBuiltin(n),
        s"$n collides with a Spark built-in")
    }
  }
}
