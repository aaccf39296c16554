package graft.model

import java.sql.Timestamp

/** The merged per-query record, mirroring the reference's `chQuery` struct
  * (/root/reference/query.go:25-45). Field defaults are the Go zero values the
  * reference leaves in place when a given log line never arrives.
  *
  * `tcpProcessed` is declared but never assigned in the reference (dead field
  * matching the README TODO "Add time spent on tcp / http handling") — kept
  * for schema fidelity, always 0.0.
  */
case class ChQuery(
    id: String,
    host: String = "",
    port: Long = 0L,
    pid: Long = 0L,
    query: String = "",
    startTime: Option[Timestamp] = None,
    endTime: Option[Timestamp] = None,
    rowsRead: Long = 0L,
    bytesRead: Long = 0L,
    elapsed: Double = 0.0,
    rps: Long = 0L,
    speed: Long = 0L,
    memory: Long = 0L,
    fullInfo: Boolean = false,
    error: Boolean = false,
    errorCode: Long = 0L,
    errorMessage: String = "",
    stmtType: String = "other",
    tcpProcessed: Double = 0.0)

/** One typed event parsed from a single log line (the tagged union of the
  * four patterns at /root/reference/query.go:15-18). `seq` is the arrival
  * order (line number); correlation is arrival-order driven in the reference.
  */
case class LogEvent(
    seq: Long,
    kind: String, // initial | stats | error | memory
    id: String,
    pid: Option[Long],
    ts: Option[Timestamp], // parsed dt (used for initial + memory)
    host: Option[String],
    port: Option[Long],
    queryText: Option[String],
    stmtType: Option[String],
    rowsRead: Option[Long],
    bytesRead: Option[Long],
    rps: Option[Long],
    speed: Option[Long],
    memory: Option[Long],
    errorCode: Option[Long],
    errorMessage: Option[String],
    cvOk: Boolean)
