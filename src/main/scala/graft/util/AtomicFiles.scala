package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe small-file write/read: content lands in a dot-prefixed
  * temp sibling, is hsync'd, then renamed over the target (delete +
  * rename, for filesystems whose rename does not overwrite). Shared by
  * every pointer/marker file in the engine — index generation pointers
  * and commit markers, the retention roll-forward plan, the sink
  * compaction low-water mark — so the durability ordering (write →
  * hsync → close → delete → rename) lives in exactly one place and a
  * hardening fix reaches all of them.
  */
object AtomicFiles {

  def writeString(fs: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.inprogress")
    val out = fs.create(tmp, true)
    try { out.write(content.getBytes("UTF-8")); out.hsync() } finally out.close()
    if (fs.exists(p)) { fs.delete(p, false); () }
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"atomic write rename failed: $tmp -> $p")
  }

  def readString(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else scala.util.Try {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8")
    }.toOption

  def writeLong(fs: FileSystem, p: Path, v: Long): Unit =
    writeString(fs, p, v.toString)

  def readLong(fs: FileSystem, p: Path): Option[Long] =
    readString(fs, p).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
}
