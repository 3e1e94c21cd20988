// Minimal slf4j stand-in for offline compilation of the reference.
package org.slf4j

trait Marker

package event {
  sealed trait Level
  object Level {
    case object TRACE extends Level
    case object DEBUG extends Level
    case object INFO extends Level
    case object WARN extends Level
    case object ERROR extends Level
  }
}

package helpers {
  class FormattingTuple(msg: String) {
    def getMessage: String = msg
  }
  object MessageFormatter {
    private def fmt(format: String, args: Seq[scala.Any]): String = {
      var s = format
      for (a <- args) s = s.replaceFirst("\\{\\}", java.util.regex.Matcher.quoteReplacement(String.valueOf(a)))
      s
    }
    def format(format: String, arg: scala.Any): FormattingTuple = new FormattingTuple(fmt(format, Seq(arg)))
    def format(format: String, arg1: scala.Any, arg2: scala.Any): FormattingTuple = new FormattingTuple(fmt(format, Seq(arg1, arg2)))
    def arrayFormat(format: String, args: Array[AnyRef]): FormattingTuple = new FormattingTuple(fmt(format, args.toSeq))
  }
}

trait Logger {
  def getName: String
  def isTraceEnabled: Boolean
  def trace(msg: String): Unit
  def trace(format: String, arg: scala.Any): Unit
  def trace(format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def trace(format: String, arguments: AnyRef*): Unit
  def trace(msg: String, t: Throwable): Unit
  def isTraceEnabled(marker: Marker): Boolean
  def trace(marker: Marker, msg: String): Unit
  def trace(marker: Marker, format: String, arg: scala.Any): Unit
  def trace(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def trace(marker: Marker, format: String, argArray: AnyRef*): Unit
  def trace(marker: Marker, msg: String, t: Throwable): Unit
  def isDebugEnabled: Boolean
  def debug(msg: String): Unit
  def debug(format: String, arg: scala.Any): Unit
  def debug(format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def debug(format: String, arguments: AnyRef*): Unit
  def debug(msg: String, t: Throwable): Unit
  def isDebugEnabled(marker: Marker): Boolean
  def debug(marker: Marker, msg: String): Unit
  def debug(marker: Marker, format: String, arg: scala.Any): Unit
  def debug(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def debug(marker: Marker, format: String, argArray: AnyRef*): Unit
  def debug(marker: Marker, msg: String, t: Throwable): Unit
  def isInfoEnabled: Boolean
  def info(msg: String): Unit
  def info(format: String, arg: scala.Any): Unit
  def info(format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def info(format: String, arguments: AnyRef*): Unit
  def info(msg: String, t: Throwable): Unit
  def isInfoEnabled(marker: Marker): Boolean
  def info(marker: Marker, msg: String): Unit
  def info(marker: Marker, format: String, arg: scala.Any): Unit
  def info(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def info(marker: Marker, format: String, argArray: AnyRef*): Unit
  def info(marker: Marker, msg: String, t: Throwable): Unit
  def isWarnEnabled: Boolean
  def warn(msg: String): Unit
  def warn(format: String, arg: scala.Any): Unit
  def warn(format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def warn(format: String, arguments: AnyRef*): Unit
  def warn(msg: String, t: Throwable): Unit
  def isWarnEnabled(marker: Marker): Boolean
  def warn(marker: Marker, msg: String): Unit
  def warn(marker: Marker, format: String, arg: scala.Any): Unit
  def warn(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def warn(marker: Marker, format: String, argArray: AnyRef*): Unit
  def warn(marker: Marker, msg: String, t: Throwable): Unit
  def isErrorEnabled: Boolean
  def error(msg: String): Unit
  def error(format: String, arg: scala.Any): Unit
  def error(format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def error(format: String, arguments: AnyRef*): Unit
  def error(msg: String, t: Throwable): Unit
  def isErrorEnabled(marker: Marker): Boolean
  def error(marker: Marker, msg: String): Unit
  def error(marker: Marker, format: String, arg: scala.Any): Unit
  def error(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit
  def error(marker: Marker, format: String, argArray: AnyRef*): Unit
  def error(marker: Marker, msg: String, t: Throwable): Unit
}

class NoopLogger(name: String) extends Logger {
  def getName: String = name
  def isTraceEnabled: Boolean = false
  def trace(msg: String): Unit = ()
  def trace(format: String, arg: scala.Any): Unit = ()
  def trace(format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def trace(format: String, arguments: AnyRef*): Unit = ()
  def trace(msg: String, t: Throwable): Unit = ()
  def isTraceEnabled(marker: Marker): Boolean = false
  def trace(marker: Marker, msg: String): Unit = ()
  def trace(marker: Marker, format: String, arg: scala.Any): Unit = ()
  def trace(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def trace(marker: Marker, format: String, argArray: AnyRef*): Unit = ()
  def trace(marker: Marker, msg: String, t: Throwable): Unit = ()
  def isDebugEnabled: Boolean = false
  def debug(msg: String): Unit = ()
  def debug(format: String, arg: scala.Any): Unit = ()
  def debug(format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def debug(format: String, arguments: AnyRef*): Unit = ()
  def debug(msg: String, t: Throwable): Unit = ()
  def isDebugEnabled(marker: Marker): Boolean = false
  def debug(marker: Marker, msg: String): Unit = ()
  def debug(marker: Marker, format: String, arg: scala.Any): Unit = ()
  def debug(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def debug(marker: Marker, format: String, argArray: AnyRef*): Unit = ()
  def debug(marker: Marker, msg: String, t: Throwable): Unit = ()
  def isInfoEnabled: Boolean = false
  def info(msg: String): Unit = ()
  def info(format: String, arg: scala.Any): Unit = ()
  def info(format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def info(format: String, arguments: AnyRef*): Unit = ()
  def info(msg: String, t: Throwable): Unit = ()
  def isInfoEnabled(marker: Marker): Boolean = false
  def info(marker: Marker, msg: String): Unit = ()
  def info(marker: Marker, format: String, arg: scala.Any): Unit = ()
  def info(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def info(marker: Marker, format: String, argArray: AnyRef*): Unit = ()
  def info(marker: Marker, msg: String, t: Throwable): Unit = ()
  def isWarnEnabled: Boolean = false
  def warn(msg: String): Unit = ()
  def warn(format: String, arg: scala.Any): Unit = ()
  def warn(format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def warn(format: String, arguments: AnyRef*): Unit = ()
  def warn(msg: String, t: Throwable): Unit = ()
  def isWarnEnabled(marker: Marker): Boolean = false
  def warn(marker: Marker, msg: String): Unit = ()
  def warn(marker: Marker, format: String, arg: scala.Any): Unit = ()
  def warn(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def warn(marker: Marker, format: String, argArray: AnyRef*): Unit = ()
  def warn(marker: Marker, msg: String, t: Throwable): Unit = ()
  def isErrorEnabled: Boolean = false
  def error(msg: String): Unit = ()
  def error(format: String, arg: scala.Any): Unit = ()
  def error(format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def error(format: String, arguments: AnyRef*): Unit = ()
  def error(msg: String, t: Throwable): Unit = ()
  def isErrorEnabled(marker: Marker): Boolean = false
  def error(marker: Marker, msg: String): Unit = ()
  def error(marker: Marker, format: String, arg: scala.Any): Unit = ()
  def error(marker: Marker, format: String, arg1: scala.Any, arg2: scala.Any): Unit = ()
  def error(marker: Marker, format: String, argArray: AnyRef*): Unit = ()
  def error(marker: Marker, msg: String, t: Throwable): Unit = ()
}

object LoggerFactory {
  def getLogger(name: String): Logger = new NoopLogger(name)
  def getLogger(cls: Class[_]): Logger = new NoopLogger(cls.getName)
}
