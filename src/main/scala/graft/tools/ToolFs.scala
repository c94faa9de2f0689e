package graft.tools

/** Shared filesystem helper for the evidence mains (PlanEvidence,
  * DedupScale): one recursive delete so a future hardening (symlink
  * handling, failure reporting) lands in one place.
  */
private[tools] object ToolFs {
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }
}
