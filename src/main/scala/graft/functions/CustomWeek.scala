package graft.functions

import java.time.LocalDate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** CH custom-week numbering (ref src/Common/DateLUTImpl.h toYearWeek and
  * src/Functions/toCustomWeek.cpp): MySQL WEEK() mode bits — bit0 Monday
  * first, bit1 week range 1..53 instead of 0..53, bit2 "week 1 contains
  * the first first-day-of-week" instead of ISO's 4-day rule, bit3 "week 1
  * contains January 1". `check_week_mode` flips bit2 on when bit0 is off.
  */
object CustomWeek {

  /** ISO day of week 1=Mon..7=Sun. */
  private def dow(d: LocalDate): Int = d.getDayOfWeek.getValue

  /** ref DateLUTImpl.h calc_weekday: 0=Monday…, or 0=Sunday… */
  private def calcWeekday(d: LocalDate, sundayFirst: Boolean): Int =
    if (!sundayFirst) dow(d) - 1
    else dow(d.plusDays(1)) - 1

  private def daysInYear(y: Int): Int = if (LocalDate.of(y, 1, 1).isLeapYear) 366 else 365

  /** (year, week) for the date, CH/MySQL week_mode semantics. */
  def yearWeek(epochDays: Int, mode0: Int): (Int, Int) = {
    val newyearDay = (mode0 & 8) != 0
    var m = mode0 & 7
    if ((m & 1) == 0) m ^= 4 // check_week_mode
    val mondayFirst = (m & 1) != 0
    var weekYear = (m & 2) != 0
    val firstWeekday = (m & 4) != 0
    val d = LocalDate.ofEpochDay(epochDays.toLong)

    if (newyearDay) {
      // ref toYearWeekOfNewyearMode
      val offset = if (mondayFirst) 0 else 1
      val ywFirst = d.plusDays(7L - dow(d.plusDays(offset.toLong))).getYear
      var firstDay = LocalDate.of(ywFirst, 1, 1)
      var thisDay = d
      if (mondayFirst) {
        firstDay = firstDay.minusDays(dow(firstDay) - 1L)
        thisDay = thisDay.minusDays(dow(thisDay) - 1L)
      } else {
        if (dow(firstDay) != 7) firstDay = firstDay.minusDays(dow(firstDay).toLong)
        if (dow(thisDay) != 7) thisDay = thisDay.minusDays(dow(thisDay).toLong)
      }
      val week = ((thisDay.toEpochDay - firstDay.toEpochDay) / 7 + 1).toInt
      return (ywFirst, week)
    }

    var ywFirst = d.getYear
    val dayNumber = d.toEpochDay
    var firstDayNumber = LocalDate.of(ywFirst, 1, 1).toEpochDay
    var weekday = calcWeekday(LocalDate.of(ywFirst, 1, 1), !mondayFirst)
    var days = 0L

    if (d.getMonthValue == 1 && d.getDayOfMonth <= 7 - weekday) {
      if (!weekYear &&
        ((firstWeekday && weekday != 0) || (!firstWeekday && weekday >= 4)))
        return (ywFirst, 0)
      weekYear = true
      ywFirst -= 1
      val diy = daysInYear(ywFirst)
      firstDayNumber -= diy
      weekday = (weekday + 53 * 7 - diy) % 7
    }

    days =
      if ((firstWeekday && weekday != 0) || (!firstWeekday && weekday >= 4))
        dayNumber - (firstDayNumber + (7 - weekday))
      else dayNumber - (firstDayNumber - weekday)

    if (weekYear && days >= 52 * 7) {
      weekday = (weekday + daysInYear(ywFirst)) % 7
      if ((!firstWeekday && weekday < 4) || (firstWeekday && weekday == 0))
        return (ywFirst + 1, 1)
    }

    (ywFirst, (days / 7 + 1).toInt)
  }
}

/** toWeek / toYearWeek (kind = "week" | "yearweek" | "startofweek"). */
case class ChCustomWeek(child: Expression, mode: Int, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (kind == "startofweek") DateType else IntegerType
  override def nullable: Boolean = true

  private def toDays(input: Any): Int = child.dataType match {
    case DateType => input.asInstanceOf[Int]
    case TimestampType | TimestampNTZType =>
      Math.floorDiv(input.asInstanceOf[Long], 86400000000L).toInt
    // a DateTime64 UDT value (ticks, scale, tz): the day boundary is
    // taken in the VALUE's zone (02096 saturation tests feed
    // toMonday(toDateTime(0, 'America/…')))
    case _: DateTime64UDT =>
      val r = input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val micros = ChDT64.toMicros(r.getLong(0), r.getInt(1))
      val zone = java.time.ZoneId.of(
        if (r.isNullAt(2)) "UTC" else r.getUTF8String(2).toString)
      java.time.Instant
        .ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(zone).toLocalDate.toEpochDay.toInt
    case _ => input.asInstanceOf[Number].intValue()
  }

  override def nullSafeEval(input: Any): Any = {
    val days = toDays(input)
    kind match {
      case "yearweek" =>
        val (y, w) = CustomWeek.yearWeek(days, mode | 2) // toYearWeek forces YEAR bit
        y * 100 + w
      case "startofweek" =>
        val d = LocalDate.ofEpochDay(days.toLong)
        val monday = (mode & 1) != 0
        val dw = d.getDayOfWeek.getValue // 1=Mon..7=Sun
        val back = if (monday) dw - 1 else (if (dw == 7) 0 else dw)
        // the Date RESULT saturates at epoch day 0 (DateLUTImpl.h;
        // 02096's toStartOfWeek(toDate(0)) = 1970-01-01)
        math.max(0, days - back)
      case _ =>
        CustomWeek.yearWeek(days, mode)._2
    }
  }

  override protected def withNewChildInternal(c: Expression): ChCustomWeek =
    copy(child = c)
  override def prettyName: String = s"to${kind.capitalize}"
}
