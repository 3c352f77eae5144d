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
    // Record the PARAMETER key alongside the store (backfilled on
    // reuse): two differently-parameterized stores of the same
    // (prefix, source) are SIBLINGS, not supersessions — without this
    // marker, building ann_ivf's refined-index store would delete the
    // seed-index store it coexists with. Missing marker (pre-r12
    // stores) reads as "".
    try {
      java.nio.file.Files.createDirectories(store)
      if (!java.nio.file.Files.exists(store.resolve("_extra_key")))
        java.nio.file.Files.writeString(store.resolve("_extra_key"), extraKey)
    } catch {
      case _: java.io.IOException => () // best-effort, like markSource
    }
    (store, ready)
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
          val marker = p.resolve("_source_dir")
          val keyMarker = p.resolve("_extra_key")
          val siblingKey =
            if (java.nio.file.Files.exists(keyMarker))
              java.nio.file.Files.readString(keyMarker)
            else ""
          if (siblingKey == extraKey &&
              java.nio.file.Files.exists(marker) &&
              java.nio.file.Files.readString(marker) == sfDir) {
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
