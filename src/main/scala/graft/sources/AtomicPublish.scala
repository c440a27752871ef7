package graft.sources

/** Atomic publish-once for locally materialized fixture directories:
  * generate into a private staging dir, ATOMIC_MOVE it onto `out`, and
  * treat a failed rename as "lost the race" ONLY when the destination
  * actually exists. On Linux a rename onto an existing non-empty
  * directory surfaces ENOTEMPTY as `DirectoryNotEmptyException`, not
  * `FileAlreadyExistsException` — catching only the latter crashed the
  * losing concurrent writer and leaked its staging tree. Both are
  * `FileSystemException`; the `exists()` re-check keeps genuinely failed
  * moves (EXDEV, permissions) loud instead of silently discarding the
  * generated data. */
object AtomicPublish {

  /** Materialize `out` exactly once: if absent, run `gen(stagingDir)`
    * (staging pre-created unless `preCreate = false` — Hadoop
    * OutputFormat writers require a non-existent target) then atomically
    * rename staging → out. Concurrent callers race on the rename; losers
    * delete their staging and read the winner's directory. Returns
    * `out.getPath`. */
  def once(out: java.io.File, preCreate: Boolean = true)
          (gen: java.io.File => Unit): String = {
    if (!out.exists()) {
      val staging = new java.io.File(
        s"${out.getPath}.staging_${System.nanoTime()}")
      if (preCreate) staging.mkdirs()
      gen(staging)
      try java.nio.file.Files.move(staging.toPath, out.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          if (out.exists()) // lost the race: use the winner's tree
            org.apache.commons.io.FileUtils.deleteDirectory(staging)
          else throw e
      }
    }
    out.getPath
  }
}
