package graft.acid

import java.net.URI

import org.apache.hadoop.fs.Path

/** Test filesystem that models an S3-class object store's `rename`:
  * a NON-atomic existence-check-then-copy (Hadoop s3a does exactly
  * this), registered under the `nafs://` scheme. A rename-based
  * publish over it can double-claim a version — the vulnerability the
  * [[ConditionalPutClaimer]] seam exists to close. The optional
  * barrier lets a test park BOTH racing writers between their
  * existence checks and their copies, making the lost-update
  * interleaving deterministic instead of a timing lottery. */
class NonAtomicRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("nafs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // directory renames (parquet task commits) take the real path — the
    // claim under test is always a single manifest FILE
    if (exists(src) && getFileStatus(src).isDirectory)
      return super.rename(src, dst)
    if (exists(dst)) return false // the s3a-style pre-check
    NonAtomicRenameFs.renameBarrier.foreach(_.await())
    // non-atomic completion: copy bytes, then delete the source — a
    // concurrent winner's target is silently overwritten, exactly the
    // failure mode an atomic rename cannot have
    val in = open(src)
    val bytes = try in.readAllBytes() finally in.close()
    val out = create(dst, true)
    try out.write(bytes) finally out.close()
    delete(src, false)
    true
  }
}

object NonAtomicRenameFs {
  @volatile var renameBarrier: Option[java.util.concurrent.CyclicBarrier] = None
}

/** In-memory stand-in for a store's conditional write (S3
  * `If-None-Match: *` PUT): one atomic compare-and-claim per target
  * URI, with the body written only by the winner. The CAS set is the
  * "store"'s precondition state; the pre-existing-file check covers a
  * table inherited from a previous process. */
class TestConditionalPutClaimer extends ConditionalPutClaimer {
  override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, target: Path,
      body: Array[Byte]): Boolean = {
    val key = fs.makeQualified(target).toUri.toString
    if (fs.exists(target)) return false
    if (!TestConditionalPutClaimer.claimed.add(key)) return false
    val out = fs.create(target, false)
    try out.write(body) finally out.close()
    true
  }
}

object TestConditionalPutClaimer {
  val claimed: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** Test filesystem (`cfs://`) that counts manifest opens — the
  * observable for the O(interval + asked-range) metadata contracts of
  * ranged history(), roll-forward changes(), and the galloping head
  * probe (each manifest open is an RPC on an object store). */
class CountingManifestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("cfs:///")
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val n = f.getName
    if (n.startsWith("v") && n.endsWith(".json"))
      CountingManifestFs.manifestOpens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object CountingManifestFs {
  val manifestOpens = new java.util.concurrent.atomic.AtomicLong(0)
}
