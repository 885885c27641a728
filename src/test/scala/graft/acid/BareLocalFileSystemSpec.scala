package graft.acid

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, Options, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The no-fork local FS must behave exactly like the stock local FS for
  * everything the engine does — create/rename/list/read, checksum
  * sidecars, fails-if-exists rename claims — while never needing the
  * chmod/ls/readlink shell forks (behavior asserted through the public
  * contract; the fork removal itself is what the overrides delete). */
class BareLocalFileSystemSpec extends AnyFunSuite {

  private def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", classOf[BareLocalFileSystem].getName)
    c.set("fs.AbstractFileSystem.file.impl", classOf[BareLocalFs].getName)
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_barefs_")

  test("FileSystem plane: create/read/list/rename with checksums intact") {
    val fs = FileSystem.get(new URI("file:///"), conf())
    assert(fs.isInstanceOf[BareLocalFileSystem])
    val dir = new Path(tmp().toString)
    val f = new Path(dir, "a.txt")
    val out = fs.create(f, true)
    out.write("hello".getBytes("UTF-8")); out.close()
    // checksum sidecar still written (LocalFileSystem layer kept)
    assert(fs.asInstanceOf[org.apache.hadoop.fs.LocalFileSystem]
      .pathToFile(new Path(dir, ".a.txt.crc")).exists())
    val in = fs.open(f)
    val buf = new Array[Byte](5); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") == "hello")
    val st = fs.getFileStatus(f)
    assert(st.getLen == 5 && !st.isDirectory)
    assert(st.getPermission != null) // preset, never a lazy `ls` fork
    val listed = fs.listStatus(dir).map(_.getPath.getName).toSet
    assert(listed.contains("a.txt"))
    assert(fs.rename(f, new Path(dir, "b.txt")))
    assert(fs.exists(new Path(dir, "b.txt")) && !fs.exists(f))
    // setPermission is a no-op, not an error
    fs.setPermission(new Path(dir, "b.txt"),
      org.apache.hadoop.fs.permission.FsPermission.valueOf("-rw-------"))
  }

  test("FileContext plane: atomic rename overwrite (metadata-log shape)") {
    val fc = FileContext.getFileContext(new URI("file:///"), conf())
    val dir = new Path(tmp().toString)
    fc.mkdir(dir, null, true)
    val tmpF = new Path(dir, ".tmp1")
    val dst = new Path(dir, "0")
    val o = fc.create(tmpF, java.util.EnumSet.of(CreateFlag.CREATE))
    o.write("v1".getBytes("UTF-8")); o.close()
    fc.rename(tmpF, dst, Options.Rename.NONE)
    assert(fc.util().exists(dst) && !fc.util().exists(tmpF))
    // fails-if-exists semantics preserved (the manifest claim contract)
    val o2 = fc.create(tmpF, java.util.EnumSet.of(CreateFlag.CREATE))
    o2.write("v2".getBytes("UTF-8")); o2.close()
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      fc.rename(tmpF, dst, Options.Rename.NONE)
    }
    // overwrite rename still works
    fc.rename(tmpF, dst, Options.Rename.OVERWRITE)
    val in = fc.open(dst)
    val buf = new Array[Byte](2); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") == "v2")
  }

  test("symlinks keep stock getFileLinkStatus semantics") {
    val fs = FileSystem.get(new URI("file:///"), conf())
    val d = tmp()
    val target = d.resolve("target.txt")
    java.nio.file.Files.write(target, "x".getBytes("UTF-8"))
    val link = d.resolve("link.txt")
    java.nio.file.Files.createSymbolicLink(link, target)
    // a real symlink goes through the stock (fork) path and reports
    // link-ness; a regular file takes the fork-free path
    val linkSt = fs.getFileLinkStatus(new Path(link.toString))
    assert(linkSt.isSymlink)
    val regSt = fs.getFileLinkStatus(new Path(target.toString))
    assert(!regSt.isSymlink && regSt.getLen == 1)
  }
}
