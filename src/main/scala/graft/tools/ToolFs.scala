package graft.tools

/** Shared filesystem helper for the evidence mains (PlanEvidence,
  * DedupScale): one recursive delete so hardening lands in one place.
  */
private[tools] object ToolFs {
  /** Recursive delete that does NOT follow directory symlinks: both
    * callers remove world-writable /tmp and /dev/shm paths, where a
    * stale or planted symlink would otherwise have its TARGET's contents
    * recursively deleted (`File.isDirectory` is true for a link to a
    * directory). The link itself is deleted, its target untouched.
    */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }
}
