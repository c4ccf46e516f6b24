package graft.pipeline

/** Scalar-dialect bridges for the SQLite pass-through surface
  * (SURVEY.md §2.C): translations a user migrating SQLite query strings
  * needs, kept as pure string/format mappers so they compose with the
  * `.sheet` rewriter before `spark.sql`.
  */
object SqliteDialect {

  /** SQLite GLOB pattern → SQL LIKE pattern. GLOB is case-sensitive with
    * `*`/`?` wildcards (Spark LIKE is case-sensitive already, so only
    * the wildcards and escaping differ). `[...]` character classes have
    * no LIKE equivalent — rejected with a clear error.
    */
  def globToLike(glob: String): String = {
    require(!glob.exists(c => c == '[' || c == ']'),
      s"GLOB character classes are not translatable to LIKE: $glob")
    val sb = new StringBuilder
    glob.foreach {
      case '*' => sb.append('%')
      case '?' => sb.append('_')
      case '%' => sb.append("\\%")
      case '_' => sb.append("\\_")
      case '\\' => sb.append("\\\\")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** SQLite strftime format → Spark/Java datetime pattern.
    * Covers the directives SQLite documents; unknown directives error
    * rather than silently passing through.
    */
  def strftimeToSpark(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'j' => sb.append("DDD")
          case 'W' => sb.append("ww")
          case '%' => sb.append('%')
          case other => throw new IllegalArgumentException(
            s"strftime directive %$other has no Spark date_format mapping")
        }
        i += 2
      } else {
        // quote literal letters so date_format doesn't interpret them
        if (c.isLetter) sb.append('\'').append(c).append('\'')
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
