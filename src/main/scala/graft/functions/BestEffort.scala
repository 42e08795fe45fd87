package graft.functions

/** parseDateTimeBestEffort — semantic port of the reference's lenient
  * datetime reader (ref src/IO/parseDateTimeBestEffort.cpp, the
  * readDigits state machine): ISO forms, compact YYYYMMDD[hhmmss],
  * DD/MM/YY[YY], alphabetic months, RFC-2822 weekday prefixes, unix
  * timestamps (9, 10 or 13 digits), AM/PM, Z / ±hh[:mm] offsets and the
  * UTC/GMT/MSK/MSD abbreviations, fractional seconds. The session runs
  * UTC, so "local" and UTC agree — offsets subtract toward UTC exactly
  * as the reference's adjust_time_zone does.
  *
  * Returns epoch MICROSECONDS (fraction truncated to 6 digits), None on
  * any condition the reference rejects.
  */
object BestEffort {

  /** Like [[parseMicros]] with a named zone: the string's wall time is
    * interpreted in `tz` and the result rendered in `tz` — a no-op for
    * plain wall-time inputs, a zone shift for instant-anchored ones
    * (unix timestamps, explicit Z/±hh:mm/abbreviation offsets), matching
    * the reference's two-DateLUT contract. */
  def parseMicrosTz(input: String, tz: String,
      usStyle: Boolean = false): Option[Long] =
    parseMicrosAnchored(input, usStyle).map { case (m, anchored) =>
      if (!anchored) m
      else {
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
        val off = java.time.ZoneId.of(tz).getRules.getOffset(inst)
        m + off.getTotalSeconds * 1000000L
      }
    }

  def parseMicros(input: String, usStyle: Boolean = false): Option[Long] =
    parseMicrosAnchored(input, usStyle).map(_._1)

  /** Returns (epochMicros, instantAnchored). */
  def parseMicrosAnchored(input: String,
      usStyle: Boolean): Option[(Long, Boolean)] = {
    if (input == null) return None
    val s = input.trim
    var pos = 0
    val n = s.length

    var year = 0
    var month = 0
    var day = 0
    var hour = 0
    var minute = 0
    var second = 0
    var hasTime = false

    var hasTz = false
    var tzNeg = false
    var tzHour = 0
    var tzMin = 0

    var isAm = false
    var isPm = false
    var commaBetween = false

    var fracValue = 0L
    var fracDigits = 0

    var unixResult: Option[Long] = None

    def eof = pos >= n
    def peekc: Char = s.charAt(pos)
    def checkChar(c: Char): Boolean =
      !eof && s.charAt(pos) == c && { pos += 1; true }
    def readDigits(max: Int): String = {
      val st = pos
      while (pos < n && (pos - st) < max && s.charAt(pos).isDigit) pos += 1
      s.substring(st, pos)
    }
    def readAlpha(max: Int): String = {
      val st = pos
      while (pos < n && (pos - st) < max &&
        s.charAt(pos).isLetter && s.charAt(pos) < 128) pos += 1
      s.substring(st, pos)
    }
    def alphaMonth(a: String): Int =
      Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
        "oct", "nov", "dec").indexOf(a.take(3).toLowerCase) + 1

    var failed = false
    def fail(): Unit = { failed = true }

    while (!eof && !failed && unixResult.isEmpty) {
      if ((year != 0 && !hasTime) || (year == 0 && hasTime))
        if (peekc == ',') { commaBetween = true; pos += 1 }
      if (eof) ()
      else {
        var numDigits = 0
        var digits = ""
        if (year == 0 || !hasTime) {
          digits = readDigits(19)
          numDigits = digits.length
          numDigits match {
            case 13 if year == 0 && !hasTime =>
              unixResult = Some(digits.take(10).toLong * 1000000L +
                digits.drop(10).toLong * 1000L)
            case 10 if year == 0 && !hasTime =>
              unixResult = Some(digits.toLong * 1000000L)
            case 9 if year == 0 && !hasTime =>
              unixResult = Some(digits.toLong * 1000000L)
            case 14 if year == 0 && !hasTime =>
              year = digits.substring(0, 4).toInt
              month = digits.substring(4, 6).toInt
              day = digits.substring(6, 8).toInt
              hour = digits.substring(8, 10).toInt
              minute = digits.substring(10, 12).toInt
              second = digits.substring(12, 14).toInt
              hasTime = true
            case 8 if year == 0 =>
              year = digits.substring(0, 4).toInt
              month = digits.substring(4, 6).toInt
              day = digits.substring(6, 8).toInt
            case 6 =>
              if (year == 0 && month == 0) {
                year = digits.substring(0, 4).toInt
                month = digits.substring(4, 6).toInt
              } else if (!hasTime) {
                hour = digits.substring(0, 2).toInt
                minute = digits.substring(2, 4).toInt
                second = digits.substring(4, 6).toInt
                hasTime = true
              } else fail()
            case 4 if year == 0 =>
              year = digits.toInt
              if (!eof) {
                val delim = peekc
                if (delim < 0x20 || delim == ',' || delim == ';' ||
                  delim == '\'' || delim == '"') pos = n // break
                else if (month != 0) () // continue loop
                else {
                  pos += 1
                  val d2 = readDigits(19)
                  if (d2.length == 2 || d2.length == 1) {
                    month = d2.toInt
                    if (day == 0 && checkChar(delim)) {
                      val d3 = readDigits(19)
                      if (d3.length == 2 || d3.length == 1) day = d3.toInt
                      else if (delim != ' ') fail()
                    }
                  }
                  else if (delim != ' ') fail()
                }
              }
            case 2 | 1 =>
              val v = digits.toInt
              if (checkChar(':')) {
                if (hasTime) fail()
                else {
                  hour = v; hasTime = true
                  val mm = readDigits(19)
                  if (mm.length == 2 || mm.length == 1) {
                    minute = mm.toInt
                    if (checkChar(':')) {
                      val ss = readDigits(19)
                      if (ss.length == 2 || ss.length == 1) second = ss.toInt
                      else fail()
                    }
                  } else fail()
                }
              } else if (checkChar(',')) {
                if (month != 0 && day == 0) day = v
              } else if (checkChar('/') || checkChar('.') || checkChar('-')) {
                if (day != 0 || month != 0) fail()
                else {
                  if (usStyle) {
                    month = v
                    val dd = readDigits(19)
                    if (dd.length == 2 || dd.length == 1) day = dd.toInt
                    else fail()
                  } else {
                    day = v
                    val mm = readDigits(19)
                    if (mm.length == 2 || mm.length == 1) month = mm.toInt
                    else if (mm.isEmpty) {
                      val a = readAlpha(9)
                      if (a.length < 3) fail()
                      else {
                        val am = alphaMonth(a)
                        if (am == 0) fail() else month = am
                      }
                    } else fail()
                  }
                  if (!failed) {
                    if (month > 12) { val t = month; month = day; day = t }
                    if (checkChar('/') || checkChar('.') || checkChar('-')) {
                      if (year != 0) fail()
                      else {
                        val yy = readDigits(19)
                        if (yy.length == 4) year = yy.toInt
                        else if (yy.length == 2) {
                          year = yy.toInt
                          year += (if (year >= 70) 1900 else 2000)
                        } else fail()
                      }
                    }
                  }
                }
              } else {
                if (day != 0) hour = v else day = v
              }
            case 0 => // fall through to the symbol branch below
            case _ => fail()
          }
        }
        if (!failed && unixResult.isEmpty && numDigits == 0 && !eof) {
          val c = peekc
          if (c == ' ' || (c == 'T' && year != 0 && !hasTime)) pos += 1
          else if (c == 'Z') { pos += 1; hasTz = true }
          else if (c == '.') {
            if (!hasTime) fail()
            else {
              pos += 1
              var fd = readDigits(19)
              if (fd.length > 18) fd = fd.take(18)
              fracDigits = fd.length
              fracValue = if (fd.isEmpty) 0L else fd.toLong
            }
          } else if (c == '+' || c == '-') {
            pos += 1
            val d = readDigits(19)
            if (d.length == 6 && !hasTime && year != 0 && month != 0 &&
              day != 0) {
              hour = d.substring(0, 2).toInt
              minute = d.substring(2, 4).toInt
              second = d.substring(4, 6).toInt
              hasTime = true
            } else {
              hasTz = true
              if (c == '-') tzNeg = true
              d.length match {
                case 4 => tzHour = d.substring(0, 2).toInt
                  tzMin = d.substring(2, 4).toInt
                case 3 => tzHour = d.substring(0, 1).toInt
                  tzMin = d.substring(1, 3).toInt
                case 2 => tzHour = d.toInt
                case 1 => tzHour = d.toInt
                case _ => fail()
              }
              if (!failed && d.length < 3 && checkChar(':')) {
                val mm = readDigits(19)
                if (mm.length == 2 || mm.length == 1) tzMin = mm.toInt
                else fail()
              }
            }
          } else {
            val a = readAlpha(3)
            if (a.isEmpty) pos = n // break
            else if (a.length == 1) fail()
            else if (a.length == 2) {
              if (a(1) == 'M' || a(1) == 'm') {
                if (a(0) == 'A' || a(0) == 'a') isAm = true
                else if (a(0) == 'P' || a(0) == 'p') isPm = true
                else fail()
              } else fail()
            } else { // 3 alpha
              var dow = false
              val am = alphaMonth(a)
              val low = a.toLowerCase
              if (am != 0) month = am
              else low match {
                case "utc" | "gmt" => hasTz = true
                case "msk" => hasTz = true; tzHour = 3
                case "msd" => hasTz = true; tzHour = 4
                case "mon" | "tue" | "wed" | "thu" | "fri" | "sat" |
                    "sun" => dow = true
                case _ => fail()
              }
              if (!failed) {
                while (!eof && peekc.isLetter && peekc < 128) pos += 1
                if (dow) checkChar(',')
              }
            }
          }
        }
      }
    }

    if (failed) return None
    unixResult match {
      case Some(u) => return Some((u, true))
      case None =>
    }

    if (commaBetween && (!hasTime || year == 0 || month == 0 || day == 0))
      return None
    if (year == 0 && month == 0 && day == 0 && !hasTime) return None

    if (year == 0) year = 2000
    if (month == 0) month = 1
    if (day == 0) day = 1

    val isLeap = (year % 400 == 0) || (year % 100 != 0 && year % 4 == 0)
    val valid = month match {
      case 1 | 3 | 5 | 7 | 8 | 10 | 12 => day >= 1 && day <= 31
      case 2 => day >= 1 && day <= (if (isLeap) 29 else 28)
      case 4 | 6 | 9 | 11 => day >= 1 && day <= 30
      case _ => false
    }
    if (!valid) return None

    if (isAm && hour == 12) hour = 0
    if (isPm && hour < 12) hour += 12
    if (hour > 23 || minute > 59 || second > 59) return None

    // session is UTC, so local == UTC; offsets shift toward UTC
    var epoch = java.time.LocalDateTime
      .of(year, month, day, hour, minute, second)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    if (hasTz) {
      val delta = tzHour * 3600L + tzMin * 60L
      epoch += (if (tzNeg) delta else -delta)
    }

    val fracMicros =
      if (fracDigits == 0) 0L
      else if (fracDigits <= 6)
        fracValue * math.pow(10, 6 - fracDigits).toLong
      else fracValue / math.pow(10, fracDigits - 6).toLong
    Some((epoch * 1000000L + fracMicros, hasTz))
  }
}
