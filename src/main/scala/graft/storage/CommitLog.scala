package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned commit log: the conditional-put primitive the manifest's
  * cross-JVM CAS needs (the r10 rename-replace CAS documented its own
  * residual stat-to-rename window and pointed here).
  *
  * The manifest is no longer ONE file replaced in place — it is a
  * directory of immutable, monotonically numbered full-state files
  * (`_commitlog/v<20-digit>`), and a publish is the atomic
  * CREATE-IF-ABSENT of the next version:
  *
  *  - the CAS identity is the version NUMBER, and the compare and the
  *    swap are the same filesystem operation — there is no re-read, no
  *    stat, and therefore no time-of-check-to-time-of-use window at
  *    all. Two writers that both computed from version N both attempt
  *    `v(N+1)`; the filesystem admits exactly one.
  *  - locally the primitive is POSIX `link(2)` (`Files.createLink`):
  *    the body is fully written to a dot-temp first, then hard-linked
  *    to its final name — link atomically fails with EEXIST if the
  *    name exists, and a reader can never observe a partial body
  *    (the content exists in full before the name does). A plain
  *    `create(overwrite = false)` through Hadoop's LocalFileSystem is
  *    NOT that: it is exists-then-create, the exact TOCTOU this class
  *    exists to remove.
  *  - on HDFS-like stores the primitive is `create(path, overwrite =
  *    false)`, which IS atomic there (namenode-arbitrated); object
  *    stores need their native conditional put (S3 If-None-Match /
  *    GCS generation-match) behind this same two-method seam.
  *
  * Each version file carries the COMPLETE manifest state (the manifest
  * is tiny — floor, horizon, and a vacuum-bounded seq set), so readers
  * never replay deltas: read = list the directory, open the max
  * version. This is the `_delta_log` shape with the checkpoint folded
  * into every entry, which a bounded manifest affords. Old versions
  * are kept [[CommitLog.Keep]] deep as a list-to-open race buffer and
  * then garbage-collected by the publisher; a reader that loses that
  * race (its listed max was GC'd — requires [[CommitLog.Keep]] further
  * commits in between) re-lists once.
  *
  * Reference cross-ref: the reference has no multi-writer story at all
  * (`v3io-tsdb/pkg/appender/appender.go` assumes one appender per
  * container path); this is the lakehouse-commit design (Delta
  * `LogStore#write(overwrite=false)` contract) re-expressed for the
  * parquet layout SURVEY §1.6 defines.
  */
private[graft] object CommitLog {
  val DirName = "_commitlog"

  /** GC depth: how many superseded versions stay on disk as the
    * reader's list-to-open race buffer. */
  val Keep = 8

  def fileName(v: Long): String = f"v$v%020d"

  private def parseVersion(name: String): Option[Long] =
    if (name.length == 21 && name.charAt(0) == 'v' &&
        name.substring(1).forall(_.isDigit))
      Some(name.substring(1).toLong)
    else None

  private def dirOf(tableDir: Path) = new Path(tableDir, DirName)

  /** Newest (version, body). None = no commit log at this path (the
    * caller falls back to the legacy single-file manifest). IO and
    * parse errors propagate — the caller owns strict-vs-lenient. */
  def readLatest(fs: FileSystem, tableDir: Path): Option[(Long, String)] = {
    var attempt = 0
    while (true) {
      val versions =
        try fs.listStatus(dirOf(tableDir)).toSeq
          .flatMap(s => parseVersion(s.getPath.getName))
        catch { case _: java.io.FileNotFoundException => return None }
      if (versions.isEmpty) return None
      val v = versions.max
      try {
        val in = fs.open(new Path(dirOf(tableDir), fileName(v)))
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        return Some((v, body))
      } catch {
        // the listed max was GC'd between list and open — only possible
        // after Keep further publishes; one re-list finds the new tip
        case e: java.io.FileNotFoundException =>
          attempt += 1
          if (attempt > 1) throw e
      }
    }
    sys.error("unreachable")
  }

  /** Atomic conditional put of version `v`: true = this writer won the
    * version; false = `v` already exists (the CAS lost — another
    * writer published from the same snapshot first). Any other failure
    * propagates. */
  def tryPublish(fs: FileSystem, tableDir: Path, v: Long,
                 body: Array[Byte]): Boolean = {
    val dir = dirOf(tableDir)
    fs.mkdirs(dir)
    val dst = new Path(dir, fileName(v))
    if (fs.getScheme == "file") {
      val dstP = java.nio.file.Paths.get(dst.toUri.getPath)
      val tmp = dstP.resolveSibling(
        s".tmp.${fileName(v)}.${ProcessHandle.current.pid}.${System.nanoTime()}")
      java.nio.file.Files.write(tmp, body)
      try { java.nio.file.Files.createLink(dstP, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      // HDFS-semantics create-no-overwrite (atomic at the namenode) —
      // allowlisted schemes ONLY. Object stores (s3a, gs, abfs…) make
      // create(overwrite=false) a non-atomic exists-then-put; silently
      // taking this branch there would reintroduce the exact TOCTOU
      // this class removes, so they fail loudly until their native
      // conditional put (S3 If-None-Match / GCS generation-match) is
      // wired into this seam.
      if (!HdfsLikeSchemes.contains(fs.getScheme))
        throw new UnsupportedOperationException(
          s"CommitLog conditional put is not atomic on scheme '${fs.getScheme}' — " +
          "wire the store's native conditional put (see CommitLog class doc)")
      try {
        val out = fs.create(dst, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        // "already exists" specifically: a bare contains("exist") also
        // matches "does not exist"/"parent directory doesn't exist" and
        // would misreport infrastructure failures as lost CAS races
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage
              .toLowerCase(java.util.Locale.ROOT).contains("already exist") => false
      }
    }
  }

  /** Schemes where `create(path, overwrite=false)` is namenode-
    * arbitrated atomic create-if-absent. */
  private[graft] val HdfsLikeSchemes: Set[String] =
    Set("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")

  /** Publisher-side GC: drop versions more than [[Keep]] behind
    * `latest`. Best-effort — a failed delete is retried by whoever
    * publishes next (the cutoff only moves forward). */
  def gc(fs: FileSystem, tableDir: Path, latest: Long): Unit = {
    val cutoff = latest - Keep
    if (cutoff <= 0) return
    val old =
      try fs.listStatus(dirOf(tableDir)).toSeq
        .filter(s => parseVersion(s.getPath.getName).exists(_ <= cutoff))
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    old.foreach(s => try fs.delete(s.getPath, false) catch {
      case _: java.io.IOException => ()
    })
  }
}
