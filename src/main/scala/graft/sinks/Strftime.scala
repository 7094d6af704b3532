package graft.sinks

/** C-strftime subset for the file writer's `timestamp-format` knob
  * (8.writer.adoc: the pattern rendering `%t` in `output`, default
  * `%F_%T`; the reference hands it to libc strftime,
  * WriterFile.cpp:43-235). Pure-JVM rendering of the specifiers a
  * filename pattern plausibly uses; unknown specifiers pass through
  * unchanged (glibc behavior), so a pattern we don't cover degrades to a
  * visible literal rather than a silent wrong name. Always UTC — file
  * names must sort identically across hosts.
  */
object Strftime {

  def format(pattern: String, epochMs: Long): String = {
    val t = java.time.Instant.ofEpochMilli(epochMs)
      .atOffset(java.time.ZoneOffset.UTC)
    def p2(n: Int) = f"$n%02d"
    val sb = new java.lang.StringBuilder(pattern.length + 16)
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c != '%' || i + 1 >= pattern.length) { sb.append(c); i += 1 }
      else {
        pattern.charAt(i + 1) match {
          case 'Y' => sb.append(t.getYear)
          case 'y' => sb.append(p2(t.getYear % 100))
          case 'm' => sb.append(p2(t.getMonthValue))
          case 'd' => sb.append(p2(t.getDayOfMonth))
          case 'e' => sb.append(f"${t.getDayOfMonth}%2d")
          case 'H' => sb.append(p2(t.getHour))
          case 'M' => sb.append(p2(t.getMinute))
          case 'S' => sb.append(p2(t.getSecond))
          case 'j' => sb.append(f"${t.getDayOfYear}%03d")
          case 'F' => sb.append(t.getYear).append('-')
            .append(p2(t.getMonthValue)).append('-')
            .append(p2(t.getDayOfMonth))
          case 'T' => sb.append(p2(t.getHour)).append(':')
            .append(p2(t.getMinute)).append(':').append(p2(t.getSecond))
          case 's' => sb.append(epochMs / 1000L)
          case '%' => sb.append('%')
          case other => sb.append('%').append(other) // unknown: literal
        }
        i += 2
      }
    }
    sb.toString
  }
}
