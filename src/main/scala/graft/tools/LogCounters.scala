package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Measurement-JVM log hygiene that COUNTS what it suppresses.
  *
  * The bench must not blanket-silence a logger (ADVICE r13: raising
  * `org.apache.spark.storage.BlockManager` to ERROR hides failed disk
  * writes and eviction problems — exactly the signals needed to explain
  * an anomalous bench number). Instead, a message-matching filter on the
  * logger's own config DENIES just the known-benign notice and counts
  * each occurrence; every other event is NEUTRAL and flows to the
  * parent appenders untouched. The caller reads the counter at pass
  * boundaries and publishes it (`benignCacheRaces` in the bench
  * record) — the claim "no races" becomes N=0 when true and honest
  * data when not.
  */
object LogCounters {

  /** Attach a counting DENY filter for messages containing `marker` to
    * `loggerName`'s own LoggerConfig (created at WARN if the logger had
    * none). Returns the counter, incremented once per suppressed event.
    * Other events pass NEUTRAL. The LoggerConfig consults
    * `filter(LogEvent)` for every event routed through the logger, so
    * overriding that single overload is sufficient (the other overloads
    * are only used by context-wide filters). */
  def countingSuppression(loggerName: String, marker: String): AtomicLong = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
    val counter = new AtomicLong
    org.apache.logging.log4j.core.config.Configurator
      .setLevel(loggerName, Level.WARN)
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig(loggerName)
    if (lc.getName == loggerName) {
      lc.addFilter(new org.apache.logging.log4j.core.filter.AbstractFilter {
        override def filter(event: LogEvent): Filter.Result =
          if (event.getMessage.getFormattedMessage.contains(marker)) {
            counter.incrementAndGet()
            Filter.Result.DENY
          } else Filter.Result.NEUTRAL
      })
      ctx.updateLoggers()
    }
    counter
  }
}
