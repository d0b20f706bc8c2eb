package graft.core

/** Local-filesystem helpers shared by the self-staging entry / bench /
  * tooling mains (one definition — a fix to symlink handling or
  * delete-failure logging must not have to find N copies). */
object Fs {

  /** Recursive delete for staged temp trees — these are created every
    * verify/bench round, and a leaked corpus-sized directory per
    * invocation would fill /tmp on long-lived sessions. */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete()
  }
}
