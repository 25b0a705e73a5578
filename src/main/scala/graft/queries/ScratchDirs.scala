package graft.queries

/** Shared /tmp scratch-dir lifecycle for queries that materialize local
  * fixture state (q29's CSV slices, the sink round-trips): canonical-path
  * hash keys (no basename collisions) and a recursive delete. One copy —
  * symlink/robustness fixes apply everywhere at once.
  */
private[queries] object ScratchDirs {

  /** Hex key of the dir's canonical path — stable per filesystem
    * location, distinct across locations sharing a basename.
    */
  def pathKey(dir: String): String =
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(
      new java.io.File(dir).getCanonicalPath))

  def deleteRecursively(root: java.io.File): Unit =
    if (root.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

  /** Delete `path` recursively when this JVM exits — for pid-keyed
    * artifact dirs (the persisted phrase indexes) that would otherwise
    * accumulate one full index per bench/verify child JVM until /tmp
    * fills and prepare() starts failing. Best-effort by nature (SIGKILL
    * skips hooks), which is why the dirs are ALSO pid-keyed: a survivor
    * never poisons a fresh run, it only wastes space.
    */
  def deleteOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(new java.io.File(path))
      catch { case _: Throwable => () }))
}
