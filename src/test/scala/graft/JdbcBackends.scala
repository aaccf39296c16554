package graft

/** The JDBC backends the metric-sink spec families run against: embedded
  * Derby (the row-store that has been the suite's workhorse) and DuckDB
  * (a real columnar engine, driven through its own JDBC driver) — the
  * second live engine that retires the dialect risk a single backend
  * leaves untested (SQLState classes, type mapping, metadata probes,
  * transaction semantics). Every scenario registered through [[all]]
  * runs once per backend; the sink code itself is backend-agnostic
  * (UPDATE-then-INSERT, integrity-violation detection by SQLState CLASS,
  * JDBC-metadata DDL guards). */
object JdbcBackends {
  final case class Backend(name: String, url: String => String)

  private lazy val duckRoot =
    java.nio.file.Files.createTempDirectory("graft_duckdb").toString

  val all: Seq[Backend] = Seq(
    Backend("derby", db => s"jdbc:derby:memory:$db;create=true"),
    // file-backed (not :memory:): the sink opens a fresh connection per
    // batch, and DuckDB in-memory databases are per-connection
    Backend("duckdb", db => s"jdbc:duckdb:$duckRoot/$db.db"))
}
