package graft.sources

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Versioned registry for stored-index builds — the "version, don't
  * swap" discipline the churn reports argue for (s24's cell churn and
  * g13's edge churn exist to say "a retrain MOVED X% of assignments";
  * acting on that requires builds to COEXIST, not overwrite): each
  * `publish` writes a brand-new immutable directory under a fresh build
  * id, and only after the write completes does the family's `latest`
  * pointer move. A serve path that pins a [[IndexStore.Build]] at the
  * start of a batch window keeps reading that build's files for the
  * whole window, unaffected by a newer build landing mid-window —
  * exactly the lake-table versioning contract (publish-then-flip; no
  * reader ever sees a half-written or in-place-mutated index).
  *
  * At 100 TB the directories are object-store prefixes and the pointer
  * flip is the catalog commit; here they are temp dirs cleaned by ONE
  * static JVM shutdown hook (the `SparkEntry.storedTempDir` lifecycle,
  * which routes through this registry so every stored index family —
  * IVF, labels, neighbors, triangles, components — is versioned the
  * same way).
  *
  * Retention is a first-class API, not an afterthought: [[retain]]
  * deletes builds strictly older than the newest K, refusing to touch
  * any build a live [[pin]] references — so a nightly publisher can run
  * `retain(family, keep = 2)` after each build and a mid-window reader
  * pinned to an old build never has its files deleted under it. The
  * CADENCE input for choosing K is the churn-report family (s24 cell
  * churn, g13 edge churn, d38/mm16 dirty buckets): a build whose
  * successor moved few assignments is safe to drop early; a high-churn
  * transition argues for keeping the predecessor queryable for
  * comparison reports one window longer.
  */
object IndexStore {

  /** One immutable published build: the family it belongs to, its
    * monotonically-increasing build id, the directory its tables live
    * in, and the numeric sequence the id was minted from. Ordering and
    * retention use `seq`, never the zero-padded id string — "b10000"
    * sorts lexicographically before "b9999", so string order breaks
    * exactly when a long-lived family needs retention most. The
    * directory is never mutated after publish. */
  final case class Build(family: String, buildId: String, dir: String,
      seq: Long)

  private val builds = new ConcurrentHashMap[(String, String), Build]()
  private val latestPtr = new ConcurrentHashMap[String, String]()
  private val seq = new ConcurrentHashMap[String, AtomicLong]()
  /** Live pin refcounts per (family, buildId) — [[retain]]/[[retire]]
    * refuse while > 0. A pin is a lease a serve path takes for its
    * batch window (at 100 TB: a lease row next to the catalog entry). */
  private val pins = new ConcurrentHashMap[(String, String), AtomicInteger]()

  /** ONE static shutdown hook sweeping every directory this JVM ever
    * published (ADVICE r13: a hook PER build accumulates threads without
    * bound in a long-lived nightly publisher). Directories already
    * deleted by [[retire]]/[[retain]] are tolerated — the sweep is
    * idempotent. */
  private val sweepDirs = new ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = sweepDirs.poll()
      while (p != null) { deleteRecursively(p); p = sweepDirs.poll() }
    }, "graft-indexstore-sweep"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
    } catch { case _: Throwable => () }

  /** Write a new build of `family`: allocate the next build id and a
    * fresh directory, run `write` against it, then register the build
    * and move the family's `latest` pointer — POINTER MOVES LAST, so a
    * concurrent reader either still sees the previous build (complete)
    * or the new one (also complete), never a partial write. Nothing is
    * deleted on publish; pruning is [[retain]]'s job, on the caller's
    * cadence. */
  def publish(family: String)(write: String => Unit): Build = {
    val n = seq.computeIfAbsent(family, _ => new AtomicLong).incrementAndGet()
    val buildId = f"b$n%04d"
    val safe = family.replaceAll("[^A-Za-z0-9._-]", "_").take(40)
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-idx-$safe-")
    sweepDirs.add(tmp)
    write(tmp.toString)
    val b = Build(family, buildId, tmp.toString, n)
    builds.put((family, buildId), b)
    latestPtr.put(family, buildId)
    b
  }

  /** The family's newest COMPLETE build — the pointer a serve path
    * dereferences ONCE per batch window, then pins. */
  def latest(family: String): Option[Build] =
    Option(latestPtr.get(family))
      .flatMap(id => Option(builds.get((family, id))))

  /** Resolve a specific pinned build. A build id stays resolvable (and
    * its directory stays intact) after newer builds land. */
  def build(family: String, buildId: String): Option[Build] =
    Option(builds.get((family, buildId)))

  /** All registered builds of a family, oldest first by NUMERIC
    * sequence (never the padded id string — see [[Build.seq]]) — the
    * retention policy's input. */
  def history(family: String): Seq[Build] =
    builds.values.toArray(Array.empty[Build]).toSeq
      .filter(_.family == family).sortBy(_.seq)

  /** Take a lease on a build for a batch window: while pinned,
    * [[retire]] and [[retain]] refuse to delete it. Returns false if
    * the build is unknown (already retired or never published) — the
    * caller must re-resolve [[latest]] instead of reading a dangling
    * directory. Balance every successful pin with [[unpin]]. */
  def pin(family: String, buildId: String): Boolean =
    Option(builds.get((family, buildId))).exists { _ =>
      pins.computeIfAbsent((family, buildId), _ => new AtomicInteger)
        .incrementAndGet()
      true
    }

  /** Release a [[pin]] lease. */
  def unpin(family: String, buildId: String): Unit = {
    val c = pins.get((family, buildId))
    if (c != null && c.decrementAndGet() <= 0) pins.remove((family, buildId))
    ()
  }

  private def pinned(family: String, buildId: String): Boolean = {
    val c = pins.get((family, buildId))
    c != null && c.get() > 0
  }

  /** Delete one build's directory and drop its registry entry. Refuses
    * (returns false, deletes nothing) if the build is pinned or is the
    * family's `latest` — the current pointer must always dereference to
    * intact files. */
  def retire(family: String, buildId: String): Boolean = {
    val b = builds.get((family, buildId))
    if (b == null) false
    else if (pinned(family, buildId)) false
    else if (latestPtr.get(family) == buildId) false
    else {
      builds.remove((family, buildId))
      deleteRecursively(java.nio.file.Path.of(b.dir))
      true
    }
  }

  /** Test seam: jump a family's sequence counter forward so a spec can
    * exercise the id-width boundary (b9999 → b10000) without minting
    * ten thousand builds. Forward-only; never used outside tests. */
  private[sources] def advanceSeqForTest(family: String, to: Long): Unit = {
    seq.computeIfAbsent(family, _ => new AtomicLong)
      .accumulateAndGet(to, Math.max(_, _))
    ()
  }

  /** Retention policy: delete every build of `family` strictly older
    * (by numeric sequence) than the newest `keep`, SKIPPING any build a
    * live pin references — a pinned build survives retention and
    * becomes deletable only after [[unpin]]. Returns the builds
    * actually retired, oldest first. `keep >= 1` so `latest` is always
    * retained. Run this on the publish cadence (nightly), with `keep`
    * chosen from the churn reports (see class doc). */
  def retain(family: String, keep: Int): Seq[Build] = {
    require(keep >= 1, s"retain(keep=$keep): must keep at least latest")
    val h = history(family)
    h.dropRight(keep).filter(b => retire(family, b.buildId))
  }
}
