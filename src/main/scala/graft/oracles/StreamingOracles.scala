package graft.oracles

/** DuckDB oracle SQL for the streaming query family — the
  * literal twins split out of SparkEntry (one object per family;
  * `SparkEntry.oracleSqlBase` unions them). Entry text is
  * byte-identical to the pre-split map: derived oracles anchor on
  * exact substrings of these strings. */
object StreamingOracles {
  val sql: Map[String, String] = Map(
    "m_safe_json_decode" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(NULL AS VARCHAR) AS error_code
        |FROM events""".stripMargin,
    "m_error_routing" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN value < 10.0 THEN 1 END) AS n_invalid,
        |  COUNT(CASE WHEN NOT (value < 10.0) THEN 1 END) AS n_valid
        |FROM events GROUP BY event_type""".stripMargin,
    // The lifted set is the reference's HeaderTo 8 (HeaderTo.java:73-82):
    // target class, application code/id, exception message/stacktrace,
    // topic, application message, exception class.
    "m_headers_roundtrip" ->
      """SELECT event_id,
        |  'graft.operators.EventRow' AS error_source_target_class,
        |  'FAILED_TO_PROCESS_RECORD' AS error_source_application_code,
        |  'graft-app' AS error_source_application_id,
        |  'boom' AS error_source_exception_message,
        |  CAST(NULL AS VARCHAR) AS error_source_exception_stack_trace,
        |  'events' AS error_source_topic,
        |  'Failed to process event ' || event_id AS error_source_application_message,
        |  'java.io.IOException' AS error_source_exception_class
        |FROM events WHERE event_type = 'error'""".stripMargin,
    "m_delta_dedup" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |WHERE prev IS NULL OR prev <> event_type""".stripMargin,
  )
}
