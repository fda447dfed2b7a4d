package graft.sqlx

/** Go-style duration grammar plus the zenodb `d` (day) and `w` (week) units
  * (/root/reference/sql/duration.go:14-25,86). Multi-component strings like
  * "1h30m" are supported; leading '-' gives a negative duration.
  */
object Durations {

  private val unitMillis: Map[String, Double] = Map(
    "ns" -> 1e-6, "us" -> 1e-3, "µs" -> 1e-3, "ms" -> 1.0,
    "s" -> 1000.0, "m" -> 60000.0, "h" -> 3600000.0,
    "d" -> 86400000.0, "w" -> 604800000.0)

  private val component = "([0-9]+(?:\\.[0-9]+)?)(ns|us|µs|ms|s|m|h|d|w)".r

  /** Parse to millis. Throws on malformed input. */
  def parseMillis(s0: String): Long = {
    val s = s0.trim
    val (neg, body) =
      if (s.startsWith("-")) (true, s.substring(1))
      else if (s.startsWith("+")) (false, s.substring(1)) else (false, s)
    require(body.nonEmpty, s"empty duration: '$s0'")
    var rest = body
    var total = 0.0
    while (rest.nonEmpty) {
      component.findPrefixMatchOf(rest) match {
        case Some(m) =>
          total += m.group(1).toDouble * unitMillis(m.group(2))
          rest = rest.substring(m.end)
        case None =>
          throw new IllegalArgumentException(s"bad duration: '$s0' (at '$rest')")
      }
    }
    val ms = Math.round(total)
    if (neg) -ms else ms
  }

  def tryParseMillis(s: String): Option[Long] =
    try Some(parseMillis(s)) catch { case _: IllegalArgumentException => None }

  /** Rendering used for CROSSHIFT field suffixes — replicates the reference's
    * durationToString (/root/reference/sql/duration.go:184-200): weeks, then
    * days, then Go `time.Duration.String()` for the remainder, so 1s -> "1s",
    * 23h55m -> "23h55m0s", 8d -> "1w1d".
    */
  def format(millis: Long): String = {
    var m = Math.abs(millis)
    val weeks = m / 604800000L; m %= 604800000L
    val days = m / 86400000L; m %= 86400000L
    val sb = new StringBuilder
    if (weeks > 0) sb.append(s"${weeks}w")
    if (days > 0 || (weeks > 0 && m > 0)) sb.append(s"${days}d")
    if (m > 0) sb.append(goDurationString(m))
    if (sb.isEmpty) "0s" else sb.toString
  }

  /** Go time.Duration.String() over millis: "1h0m0s", "1m30s", "1.5s", "250ms". */
  private def goDurationString(millis: Long): String = {
    if (millis == 0) return "0s"
    if (millis < 1000) return s"${millis}ms"
    val h = millis / 3600000L
    val mPart = (millis % 3600000L) / 60000L
    val sMillis = millis % 60000L
    val secs =
      if (sMillis % 1000 == 0) s"${sMillis / 1000}s"
      else {
        val frac = (sMillis / 1000.0).toString.reverse.dropWhile(_ == '0').reverse
        s"${frac}s"
      }
    if (h > 0) s"${h}h${mPart}m$secs"
    else if (mPart > 0) s"${mPart}m$secs"
    else secs
  }
}
