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

  test("retain(keep=1) deletes unpinned old builds, skips pinned ones, " +
    "never touches latest") {
    val family = "spec:retention"
    def oneBuild(v: Long): IndexStore.Build =
      IndexStore.publish(family) { dir =>
        Seq((1L, v)).toDF("k", "v").write.parquet(s"$dir/t")
      }
    val b1 = oneBuild(1); val b2 = oneBuild(2); val b3 = oneBuild(3)
    // a mid-window reader takes a lease on build 2
    assert(IndexStore.pin(family, b2.buildId))
    val retired = IndexStore.retain(family, keep = 1)
    // build 1 (old, unpinned) is gone — registry AND files
    assert(retired.map(_.buildId) == Seq(b1.buildId))
    assert(IndexStore.build(family, b1.buildId).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(b1.dir)))
    // build 2 (old but PINNED) survives retention with files intact —
    // the lease contract: retention never deletes under a live reader
    assert(IndexStore.build(family, b2.buildId).isDefined)
    assert(spark.read.parquet(s"${b2.dir}/t").collect()
      .map(_.getLong(1)).toSeq == Seq(2L))
    // build 3 is still latest and intact
    assert(IndexStore.latest(family).get.buildId == b3.buildId)
    // after the window closes, the unpinned build 2 becomes deletable
    IndexStore.unpin(family, b2.buildId)
    assert(IndexStore.retain(family, keep = 1).map(_.buildId) ==
      Seq(b2.buildId))
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(b2.dir)))
    // retire refuses the latest build — the pointer must stay intact
    assert(!IndexStore.retire(family, b3.buildId))
    assert(IndexStore.latest(family).get.dir == b3.dir)
  }

  test("pin on an unknown/retired build returns false (caller must " +
    "re-resolve latest)") {
    val family = "spec:pin-unknown"
    IndexStore.publish(family)(_ => ())
    assert(!IndexStore.pin(family, "b9999"))
  }

  test("history orders by numeric sequence across the id-width boundary " +
    "(b9999 vs b10000)") {
    val family = "spec:seq-width"
    IndexStore.advanceSeqForTest(family, 9998L)
    val a = IndexStore.publish(family)(_ => ())
    val b = IndexStore.publish(family)(_ => ())
    assert(a.buildId == "b9999" && b.buildId == "b10000",
      s"unexpected ids: ${a.buildId}, ${b.buildId}")
    // lexicographic order would put b10000 FIRST; numeric seq must not
    assert(IndexStore.history(family).map(_.buildId) ==
      Seq("b9999", "b10000"))
    assert(IndexStore.latest(family).get.buildId == "b10000")
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
