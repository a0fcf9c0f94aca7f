package graft.sources

import graft.SparkSpec

class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("two builds coexist; a reader pinned to build N is unaffected " +
    "by build N+1 landing") {
    val family = "spec:ivf:/tmp/sf-test"
    val b1 = IndexStore.publish(family) { dir =>
      Seq((1L, 10L)).toDF("vec_id", "cent_id").write.parquet(s"$dir/cells")
    }
    // a serve path pins the latest build at the start of its window
    val pinned = IndexStore.latest(family).get
    assert(pinned.buildId == b1.buildId)
    // ... mid-window, a retrain publishes build N+1
    val b2 = IndexStore.publish(family) { dir =>
      Seq((1L, 99L)).toDF("vec_id", "cent_id").write.parquet(s"$dir/cells")
    }
    assert(b2.buildId != b1.buildId)
    // latest moved to N+1 for NEW windows...
    assert(IndexStore.latest(family).get.buildId == b2.buildId)
    // ...but the pinned reader still reads build N's data, untouched
    val seen = spark.read.parquet(s"${pinned.dir}/cells")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(seen == Seq((1L, 10L)),
      s"pinned build's data changed under the reader: $seen")
    // and the pin stays resolvable by id after N+1 landed
    assert(IndexStore.build(family, b1.buildId).get.dir == pinned.dir)
    assert(IndexStore.history(family).map(_.buildId) ==
      Seq(b1.buildId, b2.buildId))
  }

  test("publish moves the latest pointer only after the write lands") {
    val family = "spec:ptr-order"
    var latestDuringWrite: Option[IndexStore.Build] = None
    IndexStore.publish(family) { _ =>
      latestDuringWrite = IndexStore.latest(family)
    }
    // during the FIRST write, latest must still be unset — a reader
    // can never dereference a half-written build
    assert(latestDuringWrite.isEmpty,
      s"latest pointed at an in-flight build: $latestDuringWrite")
    val first = IndexStore.latest(family).get
    IndexStore.publish(family) { _ =>
      latestDuringWrite = IndexStore.latest(family)
    }
    assert(latestDuringWrite.get.buildId == first.buildId,
      "latest moved before the second write completed")
  }
}
