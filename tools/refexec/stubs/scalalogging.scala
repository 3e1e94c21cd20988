// Minimal scala-logging stand-in for offline compilation of the reference.
package com.typesafe.scalalogging

import scala.reflect.ClassTag

class Logger(val underlying: org.slf4j.Logger) extends Serializable {
  def isTraceEnabled: Boolean = underlying.isTraceEnabled
  def isDebugEnabled: Boolean = underlying.isDebugEnabled
  def isInfoEnabled: Boolean = underlying.isInfoEnabled
  def isWarnEnabled: Boolean = underlying.isWarnEnabled
  def isErrorEnabled: Boolean = underlying.isErrorEnabled
  def trace(msg: String): Unit = underlying.trace(msg)
  def trace(msg: String, t: Throwable): Unit = underlying.trace(msg, t)
  def debug(msg: String): Unit = underlying.debug(msg)
  def debug(msg: String, t: Throwable): Unit = underlying.debug(msg, t)
  def info(msg: String): Unit = underlying.info(msg)
  def info(msg: String, t: Throwable): Unit = underlying.info(msg, t)
  def warn(msg: String): Unit = underlying.warn(msg)
  def warn(msg: String, t: Throwable): Unit = underlying.warn(msg, t)
  def error(msg: String): Unit = underlying.error(msg)
  def error(msg: String, t: Throwable): Unit = underlying.error(msg, t)
}

object Logger {
  def apply(underlying: org.slf4j.Logger): Logger = new Logger(underlying)
  def apply(name: String): Logger = new Logger(org.slf4j.LoggerFactory.getLogger(name))
  def apply[T](implicit ct: ClassTag[T]): Logger = apply(ct.runtimeClass.getName)
}
