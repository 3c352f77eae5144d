package graft.sources

import scala.jdk.CollectionConverters._

/** Content-fingerprinted persisted-artifact stores under tmp — the
  * "pay the build once, reuse every batch" discipline shared by the
  * warm incremental-dedup signatures (`graft_base_sigs_*`), the
  * persisted IVF index (`graft_ivf_idx_*`), and (with its own
  * catalog-table shape) [[BucketedLayout]].
  *
  * A store is keyed on a CONTENT fingerprint of its source parquet
  * (per-file name+size+mtime), never just the path: regenerating the
  * source changes the fingerprint and forces a rebuild instead of
  * silently reusing stale artifacts. Superseded fingerprints of the
  * same (prefix, source dir) are deleted best-effort when a new store
  * is built — tmpdir is shared, so any IO failure (a concurrent JVM
  * reading or cleaning the same store) skips that store and never
  * fails the query; an orphan merely survives until the next rebuild.
  */
object WarmStore {

  /** Per-file name+size+mtime fingerprint of `sfDir/table.parquet`
    * (file or directory-of-files).
    */
  def fingerprint(sfDir: String, table: String): String = {
    val src = java.nio.file.Paths.get(sfDir, s"$table.parquet")
    val files: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        val st = java.nio.file.Files.list(src)
        try st.iterator().asScala.toVector.sortBy(_.toString)
        finally st.close()
      } else Seq(src)
    files.map { f =>
      s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
        java.nio.file.Files.getLastModifiedTime(f).toMillis
    }.mkString("|")
  }

  /** Resolve the store directory for (prefix, source, extraKey) and
    * report whether it is ready (`successMarker` present). When NOT
    * ready, superseded sibling stores of the same prefix and source
    * dir are cleaned up best-effort first. The caller builds into the
    * returned path (parquet writes create it), writes `successMarker`
    * if it isn't `_SUCCESS` (parquet writes that one), then calls
    * [[markSource]].
    *
    * `extraKey` folds operator parameters into the key so differently
    * parameterized artifacts never collide; empty keeps the historical
    * key derivation for pre-existing stores.
    */
  def resolve(sfDir: String, table: String, prefix: String,
      extraKey: String = "", successMarker: String = "_SUCCESS")
      : (java.nio.file.Path, Boolean) = {
    val tmpRoot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val keyBase = sfDir + "\n" + fingerprint(sfDir, table) +
      (if (extraKey.isEmpty) "" else "\n" + extraKey)
    val store = tmpRoot.resolve(prefix +
      java.util.UUID.nameUUIDFromBytes(keyBase.getBytes("UTF-8")).toString)
    val ready = java.nio.file.Files.exists(store.resolve(successMarker))
    if (!ready) cleanupSuperseded(tmpRoot, store, prefix, sfDir, extraKey)
    // Backfill the PARAMETER-key marker on existing stores (pre-r12
    // builds and direct-write callers): two differently-parameterized
    // stores of the same (prefix, source) are SIBLINGS, not
    // supersessions — without the marker, building ann_ivf's
    // refined-index store would delete the seed-index store it
    // coexists with. Missing marker reads as "". Fresh stores get the
    // marker from [[publish]].
    try {
      if (java.nio.file.Files.isDirectory(store) &&
          !java.nio.file.Files.exists(store.resolve("_extra_key")))
        java.nio.file.Files.writeString(store.resolve("_extra_key"), extraKey)
    } catch {
      case _: java.io.IOException => () // best-effort, like markSource
    }
    (store, ready)
  }

  /** Build a store ATOMICALLY: `build` writes every part (including
    * its success marker) into a temp sibling, which is then published
    * to `store` with one atomic rename. Two JVMs racing the same
    * build each construct a private temp; the loser's rename fails on
    * the winner's directory and its temp is discarded — the reader
    * path after either outcome sees only a COMPLETE store, never an
    * interleaved half-build (the hazard of building in place with
    * mode=overwrite parquet writes). Returns true if this call's
    * build won. The temp lives beside the store (same filesystem, so
    * the move is truly atomic) and carries the `_extra_key` sibling
    * marker from birth.
    */
  def publish(store: java.nio.file.Path, extraKey: String = "")
      (build: java.nio.file.Path => Unit): Boolean = {
    val tmp = store.resolveSibling(
      store.getFileName.toString + ".build-" + java.util.UUID.randomUUID())
    def discard(): Unit =
      try {
        if (java.nio.file.Files.exists(tmp)) {
          val w = java.nio.file.Files.walk(tmp)
          try w.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          finally w.close()
        }
      } catch { case _: java.io.IOException => () }
    try {
      java.nio.file.Files.createDirectories(tmp)
      build(tmp)
      // AFTER build: a mode=overwrite parquet write into tmp replaces
      // the directory, which would erase a pre-written marker
      java.nio.file.Files.writeString(tmp.resolve("_extra_key"), extraKey)
      try {
        java.nio.file.Files.move(tmp, store,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch {
        case _: java.io.IOException => discard(); false // lost the race
      }
    } catch { case e: Throwable => discard(); throw e }
  }

  /** Record the store's source dir so [[resolve]]'s cleanup can
    * reclaim it once superseded; backfills pre-marker stores on reuse.
    */
  def markSource(store: java.nio.file.Path, sfDir: String): Unit =
    if (!java.nio.file.Files.exists(store.resolve("_source_dir")))
      java.nio.file.Files.writeString(store.resolve("_source_dir"), sfDir)

  private def cleanupSuperseded(tmpRoot: java.nio.file.Path,
      keep: java.nio.file.Path, prefix: String, sfDir: String,
      extraKey: String): Unit = {
    val siblings = java.nio.file.Files.list(tmpRoot)
    try siblings.iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix))
      .filter(_ != keep)
      .foreach { p =>
        try {
          // in-flight [[publish]] temps are never supersession
          // candidates; ORPHANED temps (a crashed build) are reclaimed
          // once stale — an active build finishes in minutes
          val isTemp = p.getFileName.toString.contains(".build-")
          val stale = isTemp && (System.currentTimeMillis() -
            java.nio.file.Files.getLastModifiedTime(p).toMillis) > 3600000L
          val marker = p.resolve("_source_dir")
          val keyMarker = p.resolve("_extra_key")
          val siblingKey =
            if (java.nio.file.Files.exists(keyMarker))
              java.nio.file.Files.readString(keyMarker)
            else ""
          if (stale || (!isTemp && siblingKey == extraKey &&
              java.nio.file.Files.exists(marker) &&
              java.nio.file.Files.readString(marker) == sfDir)) {
            val victims = java.nio.file.Files.walk(p)
            try victims.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally victims.close()
          }
        } catch {
          case _: java.io.IOException | _: java.io.UncheckedIOException => ()
        }
      }
    finally siblings.close()
  }
}
