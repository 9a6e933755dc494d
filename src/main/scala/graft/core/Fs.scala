package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers. One definition of reverse-walk recursive
  * delete — commit 6da5b3b had to patch the same Files.walk fd-leak in
  * three private copies (CatalogStore, CompactionTask, Warehouse.clear);
  * a single helper means the next fix lands once. */
object Fs {

  /** Delete `p` and everything under it; a missing path (or an entry a
    * concurrent actor removed mid-walk) is a no-op, not an error. The walk
    * stream is always closed — an unclosed Files.walk leaks a directory
    * fd per call. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
