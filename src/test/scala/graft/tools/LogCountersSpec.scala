package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class LogCountersSpec extends AnyFunSuite {

  test("countingSuppression counts+denies only the marked message; " +
    "other WARNs still reach appenders") {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    val name = "graft.spec.FakeBlockManager"
    val counter = LogCounters.countingSuppression(
      name, "already exists on this machine")
    // capture what SURVIVES the filter at this logger's own config
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig(name)
    assert(lc.getName == name, "logger-specific config was not created")
    val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "spec-capture", null, null, true, Array.empty) {
      override def append(e: LogEvent): Unit = {
        seen.add(e.getMessage.getFormattedMessage); ()
      }
    }
    app.start()
    lc.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val log = org.slf4j.LoggerFactory.getLogger(name)
      log.warn("Block rdd_42_7 already exists on this machine; " +
        "not re-adding it")
      log.warn("Failed to write block rdd_1_1 to disk")
      log.warn("Block rdd_9_9 already exists on this machine; " +
        "not re-adding it")
      assert(counter.get == 2,
        s"expected 2 suppressed benign notices, counted ${counter.get}")
      val survived = seen.toArray(Array.empty[String]).toSeq
      assert(survived == Seq("Failed to write block rdd_1_1 to disk"),
        s"filter must pass non-benign WARNs through untouched: $survived")
    } finally {
      lc.removeAppender("spec-capture")
      ctx.updateLoggers()
    }
  }
}
