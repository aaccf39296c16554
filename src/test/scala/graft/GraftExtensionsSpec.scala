package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing registration of the native expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions expose parse_bytes / log_line_parse / regex_groups to SQL") {
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      assert(s2.sql("SELECT parse_bytes('1 GiB')").head().getLong(0) == 1073741824L)
      assert(s2.sql("SELECT parse_bytes('nonsense')").head().isNullAt(0))
      val line = "2024.03.01 12:00:01.123456 [ 1 ] {x} <Debug> MemoryTracker: " +
        "Peak memory usage (for query): 2 MiB."
      assert(s2.sql(s"SELECT log_line_parse('$line').kind").head().getInt(0) == 3)
      assert(s2.sql("""SELECT regex_groups('ab12', '([a-z]+)(\\d+)', 2)[1]""")
        .head().getString(0) == "12")
      assert(s2.sql("SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L))")
        .head().getLong(0) == 32L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
