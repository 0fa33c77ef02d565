package graft.io

/** Process-lifetime scratch directories for materializations that must
  * outlive a single Spark action (temp TableFormat tables, shared parquet
  * stages): `register` creates and tracks a temp dir, and a shutdown hook
  * removes everything tracked. A production deployment replaces these
  * with real warehouse paths — this seam only exists because the sandbox
  * has no writable warehouse. */
object Scratch {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(deleteRecursively(_))))
  }

  /** Create a fresh temp dir tracked for shutdown removal. */
  def register(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.add(d)
    d
  }

  def deleteRecursively(d: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
}
