package graft.acid

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the fork/exec tax.
  *
  * Without the libhadoop native library (absent in this image — and in
  * most container deployments), Hadoop's `RawLocalFileSystem` SHELLS
  * OUT for every permission operation: `create`/`mkdirs` fork a
  * `chmod` (measured 9 ms / 4 ms per call here) and the first
  * `getPermission()`/`getOwner()` on a returned `FileStatus` forks an
  * `ls -ld` (~4 ms). An ACID commit creates several files (manifest
  * temp, staged parquet parts + their .crc sidecars) and a streaming
  * micro-batch creates a dozen more (offset/commit logs, state-store
  * changelogs and zips) — driver profiles attributed 30-50% of the
  * streaming keys' wall and a steady slice of every lifecycle key to
  * `Shell.runCommand`.
  *
  * POSIX permission bits on a single-user container scratch volume
  * carry no information, so this subclass (a) no-ops `setPermission`
  * and (b) returns statuses with a fixed permission/owner so the lazy
  * `ls` probe can never fire. Everything else — checksums, atomic
  * rename, directory semantics — is the stock `LocalFileSystem`.
  * Durability is unaffected: the manifest protocol carries its own
  * CRCs and the atomic-claim rename is unchanged. Object-store
  * deployments (s3a/abfs/gs) never pass through this class; plain
  * `file://` behavior is one conf key away
  * (`spark.hadoop.fs.file.impl`). */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  private def scrub(st: FileStatus): FileStatus =
    if (st == null) null
    else new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) NoForkRawLocalFileSystem.DirPerm
      else NoForkRawLocalFileSystem.FilePerm,
      NoForkRawLocalFileSystem.User, NoForkRawLocalFileSystem.User,
      st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    scrub(super.getFileStatus(f))

  // FileSystem.rename(src, dst, options) — the FileContext rename the
  // streaming metadata logs commit through — probes BOTH endpoints via
  // getFileLinkStatus, whose deprecated local implementation forks a
  // `readlink` per call (measured ~35 ms per metadata-log rename with
  // the .crc twin). A java.nio symlink check is one syscall; actual
  // symlinks (rare — nothing the engine renames is one) keep the stock
  // fork path for exact semantics.
  override def getFileLinkStatus(f: Path): FileStatus = {
    val file = pathToFile(f)
    if (java.nio.file.Files.isSymbolicLink(file.toPath))
      super.getFileLinkStatus(f)
    else getFileStatus(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val raw = super.listStatus(f)
    if (raw == null) null else raw.map(scrub)
  }
}

object NoForkRawLocalFileSystem {
  private val FilePerm = FsPermission.valueOf("-rw-r--r--")
  private val DirPerm = FsPermission.valueOf("drwxr-xr-x")
  private val User = "graft"
}

/** `fs.file.impl` entry point: checksummed local FS over the no-fork
  * raw layer (same class shape as Hadoop's own `LocalFileSystem`). */
class BareLocalFileSystem
  extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** No-fork analog of Hadoop's `RawLocalFs` (the `AbstractFileSystem`
  * delegate around the raw local FS). */
class BareRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NoForkRawLocalFileSystem, conf,
    "file", false)

/** `fs.AbstractFileSystem.file.impl` entry point — the `FileContext`
  * tree Structured Streaming's checkpoint metadata logs prefer
  * (FileContextBasedCheckpointFileManager). Mirrors Hadoop's own
  * `LocalFs` shape exactly (ChecksumFs over the raw delegate), so
  * client-side checksums are preserved. */
class BareLocalFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.ChecksumFs(new BareRawLocalFs(uri, conf))
