package graft.streaming

import java.nio.file.{Files, LinkOption, Path, Paths}
import java.nio.file.attribute.PosixFileAttributeView
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import graft.functions.Blake2b

/** Per-file ingestion primitives: stat scan (S7), streamed blake2b
  * checksum (S8), hash-file side write (K4), bounded open-retry (S10).
  * These run inside tasks (one file row each) — the Spark analogue of
  * the reference's per-file child process.
  */
object FileIngest {

  final case class FileStats(
      path: String,
      size: Option[Long],
      time: String,
      chk: Option[String],
      uid: Option[String],
      gid: Option[String],
      perm: Option[String])

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")

  /** ref: _create_single_data_file_list_item, scicat_dataset.py:554-589. */
  def stat(pathStr: String, computeHash: Boolean = false,
      hashAlgorithm: String = "blake2b"): FileStats = {
    val path = Paths.get(pathStr)
    if (!Files.exists(path))
      return FileStats(pathStr, None, isoNow(Instant.now()), None, None, None, None)
    val size = Files.size(path)
    val mtime = Files.getLastModifiedTime(path).toInstant
    val posix = Option(Files.getFileAttributeView(
      path, classOf[PosixFileAttributeView], LinkOption.NOFOLLOW_LINKS))
      .map(_.readAttributes())
    val chk = if (computeHash) Some(checksum(path)) else None
    FileStats(pathStr, Some(size), isoNow(mtime), chk,
      posix.map(_.owner().getName), posix.map(_.group().getName),
      posix.map(p => java.nio.file.attribute.PosixFilePermissions.toString(p.permissions())))
  }

  private def isoNow(i: Instant): String =
    i.atOffset(ZoneOffset.UTC).format(tsFmt)

  /** Streamed blake2b over 128 KiB blocks
    * (ref: _calculate_checksum, scicat_dataset.py:532-551). */
  def checksum(path: Path): String = {
    val bytes = Files.readAllBytes(path) // files here are small metadata files
    Blake2b.hashHex(bytes)
  }

  /** K4: write `<name>.b2b` next to the ingestor dir and return its path
    * (ref: _build_hash_path/_save_hash_file, scicat_dataset.py:592-612). */
  def writeHashFile(original: Path, hashHex: String, dir: Path,
      extension: String = "b2b"): Path = {
    val hashPath = dir.resolve(original.getFileName.toString + "." + extension)
    Files.createDirectories(dir)
    Files.writeString(hashPath, hashHex)
    hashPath
  }

  /** S10: bounded retry with per-try delays clamped to [1, 120] s
    * (ref: open_h5file, src/scicat_nexus_helper.py:62-95) — files may
    * still be mid-write when the wrdn message arrives.
    */
  def withRetries[A](delaysSeconds: Seq[Double], sleeper: Long => Unit = Thread.sleep)
      (attempt: () => Option[A]): Option[A] = {
    val clamped = delaysSeconds.map(d => math.min(math.max(d, 1.0), 120.0))
    attempt() match {
      case some @ Some(_) => some
      case None =>
        clamped.foldLeft(Option.empty[A]) { (acc, delay) =>
          acc.orElse {
            sleeper((delay * 1000).toLong)
            attempt()
          }
        }
    }
  }
}
