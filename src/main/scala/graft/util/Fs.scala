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
}
