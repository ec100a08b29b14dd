package graft.timelib

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset, ZonedDateTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale

/**
 * Timestamp parsing/formatting with the semantics of the reference's
 * timelib package (reference: timelib/time.go:12-25,46-157).
 *
 * All times are UTC; the engine's ordering/grouping truth is an epoch
 * **nanosecond** Long (Spark TimestampType is micros-only, so LongType
 * nanos is the storage/compute representation — SURVEY.md §7.4.2).
 */
object TimeLib {

  /** Canonical key format: RFC3339 with up-to-nanos fraction, UTC,
   * trailing fraction zeros trimmed (Go time.RFC3339Nano behavior,
   * reference: handlers.go:64,71,110). */
  def formatCanonical(ns: Long): String = {
    val secs = Math.floorDiv(ns, 1000000000L)
    val frac = Math.floorMod(ns, 1000000000L)
    val base = LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    if (frac == 0) base + "Z"
    else {
      var f = f"$frac%09d"
      while (f.nonEmpty && f.last == '0') f = f.dropRight(1)
      s"$base.${f}Z"
    }
  }

  /** Hand-rolled canonical parser (reference: timelib/time.go:46-108).
   * Returns epoch ns, or None on any malformed input. Accepts
   * `yyyy-MM-ddTHH:mm:ss[.fraction]Z` with a 0-9 digit fraction. */
  def parseCanonical(in: String): Option[Long] = {
    if (in.length < 20 || in.last != 'Z') return None
    if (!(in(4) == '-' && in(7) == '-' && in(10) == 'T' &&
        in(13) == ':' && in(16) == ':' && (in(19) == '.' || in(19) == 'Z')))
      return None
    def num(s: String): Option[Int] =
      // strconv.Atoi equivalent: optional sign + digits only
      if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toInt) else None
    try {
      for {
        year <- num(in.substring(0, 4))
        month <- num(in.substring(5, 7))
        day <- num(in.substring(8, 10))
        hour <- num(in.substring(11, 13))
        minute <- num(in.substring(14, 16))
        second <- num(in.substring(17, 19))
        fracStr = if (in(19) == 'Z') "" else in.substring(20, in.length - 1)
        frac <-
          if (fracStr.isEmpty) Some(0L)
          else if (fracStr.length <= 9 && fracStr.forall(_.isDigit))
            Some(fracStr.toLong * math.pow(10, 9 - fracStr.length).toLong)
          else None
        ns <- toEpochNs(year, month, day, hour, minute, second, frac)
      } yield ns
    } catch { case _: Exception => None }
  }

  private def toEpochNs(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int,
      frac: Long): Option[Long] =
    try {
      // Go time.Date normalizes out-of-range components (month 13 → next
      // January); java.time throws. Normalized inputs never appear in
      // canonical keys, so strict rejection is the safe divergence.
      val ldt = LocalDateTime.of(y, mo, d, h, mi, s)
      Some(Math.addExact(
        Math.multiplyExact(ldt.toEpochSecond(ZoneOffset.UTC), 1000000000L),
        frac))
    } catch { case _: Exception => None }

  /** parseKey: canonical key string → epoch ns, −1 on garbage
   * (reference: database.go:366-372). */
  def parseKey(s: String): Long = parseCanonical(s).getOrElse(-1L)

  // Lenient multi-format parse table (reference: timelib/time.go:12-25).
  // Go layouts → java.time formatters. All parse to UTC when no zone.
  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseSensitive()
      .appendPattern(pattern).toFormatter(Locale.US)

  private val zonedFormats: Seq[DateTimeFormatter] = Seq(
    DateTimeFormatter.ISO_OFFSET_DATE_TIME, // RFC3339 / RFC3339Nano
    fmt("EEE, dd MMM yyyy HH:mm:ss Z"),     // RFC1123Z
    fmt("EEE, dd MMM yyyy HH:mm:ss zzz"),   // RFC1123
    fmt("EEE MMM ppd HH:mm:ss zzz yyyy"),   // Unix date (space-padded day)
    fmt("EEE MMM ppd HH:mm:ss Z yyyy"),     // Ruby date
  )
  private val localFormats: Seq[(DateTimeFormatter, Boolean)] = Seq(
    (fmt("EEE MMM ppd HH:mm:ss yyyy"), true), // ANSI C
    (fmt("yyyy-MM-dd'T'HH:mm"), true),
    (fmt("yyyy-MM-dd'T'HH"), true),
  )

  private val intRe = "^-?[0-9]+$".r

  /**
   * Lenient parser accepting every format the reference accepts
   * (reference: timelib/time.go:110-157): bare integers auto-ranged as
   * ns (> 2^31·1000) / ms (> 2^31) / s (> 10000) since epoch, the
   * canonical form, RFC3339(±nano), RFC1123(±Z), Unix/ANSI-C/Ruby
   * dates, and the prefix forms yyyy-MM-ddTHH:mm, …THH, yyyy-MM-dd,
   * yyyy-MM, yyyy. Returns epoch ns.
   */
  def parseTime(in: String): Option[Long] = {
    if (intRe.matches(in)) {
      try {
        val n = in.toLong
        if (n > Int.MaxValue.toLong * 1000L) return Some(n) // ns
        if (n > Int.MaxValue.toLong) return Some(Math.multiplyExact(n, 1000000L)) // ms
        if (n > 10000L) return Some(Math.multiplyExact(n, 1000000000L)) // s
        // ≤ 10000 falls through to the year form, as in the reference
      } catch { case _: ArithmeticException => return None
                case _: NumberFormatException => () }
    }
    parseCanonical(in).orElse(parseFormats(in))
  }

  private def parseFormats(in: String): Option[Long] = {
    zonedFormats.foreach { f =>
      try {
        val zdt = ZonedDateTime.parse(in, f)
        return Some(Math.addExact(
          Math.multiplyExact(zdt.toEpochSecond, 1000000000L), zdt.getNano.toLong))
      } catch { case _: Exception => () }
    }
    localFormats.foreach { case (f, _) =>
      try {
        val ldt = LocalDateTime.parse(in, f)
        return Some(Math.multiplyExact(ldt.toEpochSecond(ZoneOffset.UTC), 1000000000L))
      } catch { case _: Exception => () }
    }
    // date-prefix forms, zero-filled (timelib/time.go:21-24)
    try {
      val ld = in.length match {
        case 10 => LocalDate.parse(in, fmt("yyyy-MM-dd"))
        case 7  => LocalDate.parse(in + "-01", fmt("yyyy-MM-dd"))
        case 4  => LocalDate.parse(in + "-01-01", fmt("yyyy-MM-dd"))
        case _  => return None
      }
      Some(Math.multiplyExact(
        ld.atStartOfDay.toEpochSecond(ZoneOffset.UTC), 1000000000L))
    } catch { case _: Exception => None }
  }
}
