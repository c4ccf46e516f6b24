package graft

import java.nio.file.{Files, Paths}

/** [[TreeCopy]] replaced `FileUtil.copy` on the local scheme
  * (optimization r19: the checksum layer costs milliseconds per file);
  * these pin the semantics the call sites rely on — byte-identical
  * trees, `FileUtil.copy`'s nest-under-existing-directory rule, and
  * the missing-source no-op Curation's optional subtrees need.
  */
class TreeCopySpec extends SparkSpec {

  private def mkTree(): String = {
    val root = Files.createTempDirectory("treecopy_src").toString
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.write(Paths.get(s"$root/top.bin"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$root/a/mid.bin"), Array[Byte](4, 5))
    Files.write(Paths.get(s"$root/a/b/leaf.bin"),
      Array.tabulate[Byte](4096)(i => (i % 251).toByte))
    Files.write(Paths.get(s"$root/a/.leaf.bin.crc"), Array[Byte](9))
    root
  }

  private def listing(root: String): Map[String, Long] = {
    val r = Paths.get(root)
    val it = Files.walk(r).iterator()
    var m = Map.empty[String, Long]
    while (it.hasNext) {
      val p = it.next()
      if (!Files.isDirectory(p))
        m += (r.relativize(p).toString -> Files.size(p))
    }
    m
  }

  test("copies a tree byte-identically into an absent destination") {
    val src = mkTree()
    val dst = s"${Files.createTempDirectory("treecopy_dst")}/fresh"
    assert(TreeCopy.copy(spark, src, dst))
    assert(listing(dst) === listing(src))
    assert(Files.readAllBytes(Paths.get(s"$dst/a/b/leaf.bin")).toSeq ===
      Files.readAllBytes(Paths.get(s"$src/a/b/leaf.bin")).toSeq)
  }

  test("nests under an EXISTING destination directory (FileUtil rule)") {
    val src = mkTree()
    val dstRoot = Files.createTempDirectory("treecopy_dst").toString
    assert(TreeCopy.copy(spark, src, dstRoot))
    val nested = s"$dstRoot/${Paths.get(src).getFileName}"
    assert(listing(nested) === listing(src))
  }

  test("missing source copies nothing and reports false") {
    val dst = s"${Files.createTempDirectory("treecopy_dst")}/out"
    assert(!TreeCopy.copy(spark, "/nonexistent/treecopy/src", dst))
    assert(!Files.exists(Paths.get(dst)))
  }

  test("copies a single FILE source (centroid carry-over shape)") {
    val src = Files.createTempFile("treecopy_one", ".bin")
    Files.write(src, Array[Byte](7, 8, 9))
    val dst = s"${Files.createTempDirectory("treecopy_dst")}/one.bin"
    assert(TreeCopy.copy(spark, src.toString, dst))
    assert(Files.readAllBytes(Paths.get(dst)).toSeq === Seq[Byte](7, 8, 9))
  }
}
