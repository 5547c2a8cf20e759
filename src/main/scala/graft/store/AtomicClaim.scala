package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit-claim primitive: atomically publish `tmp` as `target`
  * iff `target` does not exist yet; exactly one concurrent caller wins.
  * This property is the whole optimistic-concurrency arbiter (commit
  * files, drain-step intents), so it must hold under races.
  *
  * - HDFS: `fs.rename` refuses to clobber an existing file atomically —
  *   the primitive the design assumes.
  * - Local filesystems: Hadoop's local rename gives NO such guarantee.
  *   `RawLocalFileSystem.rename` is `File.renameTo`, i.e. POSIX
  *   `rename(2)`, which silently REPLACES the destination; Hive's
  *   `ProxyLocalFileSystem` (registered for `file:` in Spark-with-Hive
  *   sessions) adds only a non-atomic `if (isFile(dst)) return false`
  *   pre-check. Two racing claims can both pass the check and both
  *   "win", collapsing two commits into one version — observed as a
  *   ~1-in-8 lost version in OccSpec's two-thread race. The only local
  *   atomic create-if-absent publication is `link(2)`: hard-link the
  *   tmp file onto the target (fails `EEXIST` atomically), then drop
  *   the tmp name.
  */
object AtomicClaim {
  def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val won =
      if (fs.getUri.getScheme == "file") {
        val s = java.nio.file.Paths.get(tmp.toUri.getPath)
        val t = java.nio.file.Paths.get(target.toUri.getPath)
        try { java.nio.file.Files.createLink(t, s); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // parent swept concurrently (vacuum/cleanup): treat as lost
          case _: java.nio.file.NoSuchFileException => false
        }
      } else fs.rename(tmp, target)
    // local: the linked tmp name is redundant either way; remote: a
    // lost rename leaves tmp behind. Deleting a now-absent tmp is a
    // harmless false return.
    if (!won || fs.getUri.getScheme == "file")
      try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    won
  }
}
