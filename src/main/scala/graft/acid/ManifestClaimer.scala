package graft.acid

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE primitive the commit protocol requires of a store: bind a
  * version's manifest path to fully-written content ATOMICALLY,
  * failing (not replacing) when the path is already claimed. Commit is
  * the single atomic point of the protocol (reference:
  * instance.rs:102-111 — the WAL commit record makes a transaction
  * durable in one step); everything else in [[VersionedTable]] is
  * ordinary idempotent file IO.
  *
  * Implementations by store class:
  *  - local / HDFS-like: [[LinkRenameClaimer]] (link(2) locally,
  *    atomic fails-if-exists rename elsewhere) — the default;
  *  - S3 / GCS-class object stores: a [[ConditionalPutClaimer]]
  *    subclass wrapping the store's conditional write (S3
  *    `If-None-Match: *` PUT, GCS `ifGenerationMatch=0`) — a Hadoop
  *    s3a `rename` is a NON-atomic existence-check-then-copy, so the
  *    default claimer cannot hold the invariant there (the same
  *    adapter every lakehouse commit protocol needs: Delta's LogStore,
  *    Iceberg's commit lock).
  *
  * Contract: returns true iff THIS caller bound the target; false on a
  * lost race; must never leave a partially-visible target (readers may
  * probe the path concurrently and must see nothing or everything).
  * PublishSpec races two writers over a deliberately non-atomic-rename
  * filesystem to pin the difference. */
trait ManifestClaimer extends Serializable {

  /** Whether [[Instance.publish]] must materialize the body as a temp
    * file beside the target before claiming (link/rename claimers
    * publish BY the temp file; conditional-PUT claimers carry the body
    * in the request and skip the extra write + sweep). */
  def needsTemp: Boolean = true

  /** Atomically claim `target`. `tmp` holds the fully-written body when
    * [[needsTemp]]; null otherwise. `body` is always the manifest
    * bytes. IOExceptions may propagate — [[Instance.publish]] maps them
    * to a failed claim. */
  def claim(fs: FileSystem, tmp: Path, target: Path, body: Array[Byte]): Boolean
}

/** Default claimer for filesystems with an atomic namespace operation.
  *  - `file:` — hard link: link(2) is atomic and EEXISTs on a lost
  *    race (POSIX rename would silently replace the winner). Mounts
  *    without hard links (exFAT, some FUSE) fall back to rename, which
  *    still fails-if-exists there, merely without cross-process
  *    atomicity on those filesystems.
  *  - anything else — `FileSystem.rename`, atomic and
  *    false-when-target-exists on HDFS-class stores. NOT safe on
  *    s3a-style object stores (non-atomic copy): use a
  *    [[ConditionalPutClaimer]] there. */
object LinkRenameClaimer extends ManifestClaimer {
  override def claim(fs: FileSystem, tmp: Path, target: Path,
      body: Array[Byte]): Boolean =
    if (fs.getUri.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException
          if !fs.exists(target) =>
          try fs.rename(tmp, target)
          catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      }
    } else {
      try fs.rename(tmp, target)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
}

/** Base for object-store claimers: subclass with the store's
  * conditional write. The body travels in the request — no temp file,
  * no namespace operation, and the store's own precondition is the
  * atomic point, which is exactly what S3-class stores guarantee and
  * their `rename` does not. */
abstract class ConditionalPutClaimer extends ManifestClaimer {
  final override def needsTemp: Boolean = false
  final override def claim(fs: FileSystem, tmp: Path, target: Path,
      body: Array[Byte]): Boolean = putIfAbsent(fs, target, body)

  /** Write `body` to `target` iff the object does not exist, as one
    * atomic store operation (S3 `If-None-Match: *`, GCS
    * `ifGenerationMatch=0`, ABFS lease). True iff this call created
    * the object. */
  def putIfAbsent(fs: FileSystem, target: Path, body: Array[Byte]): Boolean
}
