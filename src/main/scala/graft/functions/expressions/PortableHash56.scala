package graft.functions.expressions

/** The engine-portable 56-bit hash shared by the native text
  * expressions: first 7 bytes of `md5(bytes)` big-endian — exactly
  * `conv(substring(md5(x), 1, 14), 16, 10)` (the
  * `TextFunctions.portableHash64` definition every oracle mirrors).
  * MessageDigest is stateful and not thread-safe; one per thread,
  * reset per call.
  */
private[expressions] object PortableHash56 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hash `len` bytes of `bytes` starting at `off`; `dig` is a caller-
    * provided 16-byte scratch buffer (avoids an allocation per call).
    */
  def hash(bytes: Array[Byte], off: Int, len: Int, dig: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, off, len)
    md.digest(dig, 0, 16)
    ((dig(0) & 0xffL) << 48) | ((dig(1) & 0xffL) << 40) |
      ((dig(2) & 0xffL) << 32) | ((dig(3) & 0xffL) << 24) |
      ((dig(4) & 0xffL) << 16) | ((dig(5) & 0xffL) << 8) |
      (dig(6) & 0xffL)
  }
}
