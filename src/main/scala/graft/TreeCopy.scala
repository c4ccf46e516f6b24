package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory-tree copy for the artifact/fixture verbs (shard takedown,
  * model compaction, copy-on-mutate gate samples).
  *
  * On the local scheme Hadoop's `FileUtil.copy` routes every file
  * through ChecksumFileSystem — open-verify the source `.crc`,
  * regenerate the destination `.crc`, per-file FileSystem metadata
  * calls — which costs milliseconds PER FILE regardless of size, so a
  * few-hundred-file shard tree (133 KiB of bytes) pays ~2 s per copy.
  * A raw `java.nio` walk moves the same tree in tens of ms: the `.crc`
  * sidecars are ordinary files on disk and a byte copy keeps them
  * consistent with their data files, so the checksum layer sees an
  * identical tree. Non-local schemes keep the `FileUtil.copy` path.
  *
  * Destination semantics mirror `FileUtil.copy`: an EXISTING
  * destination directory nests the source under it (`dst/srcName`);
  * otherwise `dst` itself becomes the copy, parents created.
  *
  * @return false iff `src` does not exist (nothing copied).
  */
private[graft] object TreeCopy {

  private def isLocal(p: Path): Boolean = {
    val sch = p.toUri.getScheme
    sch == null || sch == "file"
  }

  def copy(spark: SparkSession, src: String, dst: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcP = new Path(src)
    val fs = srcP.getFileSystem(conf)
    if (!fs.exists(srcP)) return false
    val dstP = new Path(dst)
    // instance check, not fs.getScheme: RawLocalFileSystem (the
    // engine's local binding) does not implement getScheme
    val localFs = fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem]
    if (isLocal(srcP) && isLocal(dstP) && localFs) {
      val from = Paths.get(srcP.toUri.getPath)
      val to0 = Paths.get(dstP.toUri.getPath)
      val to =
        if (Files.isDirectory(to0)) to0.resolve(from.getFileName) else to0
      if (to.getParent != null) Files.createDirectories(to.getParent)
      val it = Files.walk(from).iterator()
      while (it.hasNext) {
        val p = it.next()
        val t = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    } else {
      org.apache.hadoop.fs.FileUtil.copy(
        fs, srcP, dstP.getFileSystem(conf), dstP, false, conf)
    }
    true
  }
}
