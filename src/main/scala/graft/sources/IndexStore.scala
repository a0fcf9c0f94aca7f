package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

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
  * flip is the catalog commit; here they are temp dirs cleaned by a JVM
  * shutdown hook (the `SparkEntry.storedTempDir` lifecycle, which now
  * routes through this registry so every stored index family — IVF,
  * labels, neighbors, triangles, components — is versioned the same
  * way). Retention is the caller's policy: nothing is deleted on
  * publish, so yesterday's build stays queryable for churn reports
  * (g13/s24 pattern) and for readers mid-window.
  */
object IndexStore {

  /** One immutable published build: the family it belongs to, its
    * monotonically-increasing build id, and the directory its tables
    * live in. The directory is never mutated after publish. */
  final case class Build(family: String, buildId: String, dir: String)

  private val builds = new ConcurrentHashMap[(String, String), Build]()
  private val latestPtr = new ConcurrentHashMap[String, String]()
  private val seq = new ConcurrentHashMap[String, AtomicLong]()

  /** Write a new build of `family`: allocate the next build id and a
    * fresh directory, run `write` against it, then register the build
    * and move the family's `latest` pointer — POINTER MOVES LAST, so a
    * concurrent reader either still sees the previous build (complete)
    * or the new one (also complete), never a partial write. */
  def publish(family: String)(write: String => Unit): Build = {
    val n = seq.computeIfAbsent(family, _ => new AtomicLong).incrementAndGet()
    val buildId = f"b$n%04d"
    val safe = family.replaceAll("[^A-Za-z0-9._-]", "_").take(40)
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-idx-$safe-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(tmp)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }))
    write(tmp.toString)
    val b = Build(family, buildId, tmp.toString)
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

  /** All registered builds of a family, oldest first — the retention
    * policy's input. */
  def history(family: String): Seq[Build] =
    builds.values.toArray(Array.empty[Build]).toSeq
      .filter(_.family == family).sortBy(_.buildId)
}
