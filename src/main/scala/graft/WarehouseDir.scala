package graft

import java.nio.file.{Files, Path, Paths}

/** Per-process Spark warehouse directory under /tmp, isolated by pid
  * so concurrent Verify/Bench/spec JVMs can't race each other's
  * managed bucketed tables (the sf1 `bucketed_join` lesson). PIDs
  * recycle, so the dir is wiped at first use — a dead process's
  * leftover warehouse must never leak stale tables into a new process
  * that inherits its pid — and wiped again by a shutdown hook on
  * clean exit so /tmp doesn't accumulate one warehouse per run. */
object WarehouseDir {
  lazy val path: String = {
    val p = Paths.get(s"/tmp/graft-wh-${ProcessHandle.current.pid}")
    delete(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
    p.toString
  }

  private def delete(p: Path): Unit =
    // best-effort: shutdown hooks run CONCURRENTLY, and SharedFrames'
    // cleanup hook may be deleting its artifact subdirs under this
    // warehouse at the same instant — a NoSuchFileException mid-walk
    // must never escape (an uncaught hook exception prints a stack
    // trace AFTER Bench's final JSON line and breaks the driver parse)
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          // deepest-first so directories empty before their own delete
          walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
            .foreach(f => Files.deleteIfExists(f))
        } finally walk.close()
      }
    } catch { case _: Throwable => () }
}
