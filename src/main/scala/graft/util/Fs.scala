package graft.util

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the staging/compaction paths. */
object Fs {
  /** Recursive delete. Closes the walk stream (an unclosed `Files.walk`
    * leaks a directory handle per call — and these run inside `finally`
    * blocks where a masked IO error would hide the real failure). */
  def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
      } finally stream.close()
    }

  /** Materialized directory listing. `Files.list` returns a stream backed
    * by an open directory handle — callers that never close it leak one fd
    * per scan, which adds up across repeated manifest walks. */
  def listDir(p: Path): Seq[Path] = {
    val stream = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toVector
    } finally stream.close()
  }
}
