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

  // Weekday handling: Go's time.Parse requires a valid weekday NAME in
  // the EEE slot but explicitly ignores its VALUE (no cross-check
  // against the date), while java.time's resolver rejects mismatches —
  // so the weekday token is stripped before parsing and the layouts
  // below carry no EEE.
  // Zone-abbreviation handling: Go on a UTC host maps EVERY
  // abbreviation (EST, GMT, …) to a fabricated zero-offset zone; the
  // abbreviation token is therefore stripped and the remainder parsed
  // as UTC wall time. Numeric offsets (Z layouts) apply normally.
  private val weekdayRe = "^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)(,)? ".r
  private val rfc1123AbbrevRe = " ([A-Za-z]{2,5})$".r
  private val unixAbbrevRe = " ([A-Za-z]{2,5}) (\\d{4})$".r

  private val zonedNoDow: Seq[DateTimeFormatter] = Seq(
    fmt("dd MMM yyyy HH:mm:ss Z"),  // RFC1123Z
    fmt("MMM ppd HH:mm:ss Z yyyy"), // Ruby date
  )
  private val localNoDow: Seq[DateTimeFormatter] = Seq(
    fmt("dd MMM yyyy HH:mm:ss"),  // RFC1123 with abbrev stripped
    fmt("MMM ppd HH:mm:ss yyyy"), // ANSI C; Unix date with abbrev stripped
  )
  private val localFormats: Seq[DateTimeFormatter] = Seq(
    fmt("yyyy-MM-dd'T'HH:mm"),
    fmt("yyyy-MM-dd'T'HH"),
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
    def zoned(s: String, f: DateTimeFormatter): Option[Long] =
      try {
        val zdt = ZonedDateTime.parse(s, f)
        Some(Math.addExact(
          Math.multiplyExact(zdt.toEpochSecond, 1000000000L), zdt.getNano.toLong))
      } catch { case _: Exception => None }
    def local(s: String, f: DateTimeFormatter): Option[Long] =
      try {
        val ldt = LocalDateTime.parse(s, f)
        Some(Math.multiplyExact(ldt.toEpochSecond(ZoneOffset.UTC), 1000000000L))
      } catch { case _: Exception => None }

    zoned(in, DateTimeFormatter.ISO_OFFSET_DATE_TIME) // RFC3339(Nano)
      .orElse {
        weekdayRe.findPrefixMatchOf(in).flatMap { m =>
          val body = in.substring(m.end)
          val deAbbrev1123 = rfc1123AbbrevRe.replaceAllIn(body, "")
          val deAbbrevUnix = unixAbbrevRe.replaceAllIn(body, " $2")
          zonedNoDow.view.flatMap(zoned(body, _)).headOption
            .orElse(localNoDow.view.flatMap { f =>
              local(body, f).orElse(local(deAbbrev1123, f))
                .orElse(local(deAbbrevUnix, f))
            }.headOption)
        }
      }
      .orElse(localFormats.view.flatMap(local(in, _)).headOption)
      .orElse(datePrefix(in))
  }

  private def datePrefix(in: String): Option[Long] = {
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
