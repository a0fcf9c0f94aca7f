package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join counts same-type neighbors in [v, v+w)") {
    val events = Seq(
      (1L, "a", 1.0), (2L, "a", 1.3), (3L, "a", 1.49),  // 1 sees 2,3
      (4L, "a", 2.6),                                    // nobody in range
      (5L, "b", 1.2))                                    // other type
      .toDF("event_id", "event_type", "value")
    val out = Temporal.rangeJoinCount(events, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("boundary: v + w itself is excluded, self never counted") {
    val events = Seq((1L, "a", 1.0), (2L, "a", 1.5))
      .toDF("event_id", "event_type", "value")
    val out = Temporal.rangeJoinCount(events, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }
}
