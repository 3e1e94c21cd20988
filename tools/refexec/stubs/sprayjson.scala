// Minimal spray-json stand-in for offline compilation of the reference.
// Write side (toJson / compactPrint) is functional so rules can be dumped;
// the parse side supports the small JSON subset the reference reads.
package spray

package object json {
  def deserializationError(msg: String, cause: Throwable = null, fieldNames: List[String] = Nil): Nothing =
    throw new DeserializationException(msg, cause, fieldNames)

  def serializationError(msg: String): Nothing = throw new SerializationException(msg)

  implicit class enrichAny[T](val any: T) {
    def toJson(implicit writer: JsonWriter[T]): JsValue = writer.write(any)
  }

  implicit class enrichString(val s: String) {
    def parseJson: JsValue = JsonParser(s)
  }

  type RootJsArrayFormat = DefaultJsonProtocol.RootJsArrayFormat.type
}

package json {

  class DeserializationException(val msg: String, val cause: Throwable = null, val fieldNames: List[String] = Nil) extends RuntimeException(msg, cause)
  object DeserializationException {
    def apply(msg: String, cause: Throwable = null, fieldNames: List[String] = Nil): DeserializationException = new DeserializationException(msg, cause, fieldNames)
  }
  class SerializationException(msg: String) extends RuntimeException(msg)

  sealed abstract class JsValue {
    def convertTo[T](implicit reader: JsonReader[T]): T = reader.read(this)
    def asJsObject: JsObject = this match {
      case o: JsObject => o
      case _ => deserializationError("JSON object expected")
    }
    def compactPrint: String = JsPrinter.print(this, pretty = false)
    def prettyPrint: String = JsPrinter.print(this, pretty = true)
    override def toString: String = compactPrint
  }

  case class JsObject(fields: Map[String, JsValue]) extends JsValue
  object JsObject {
    val empty: JsObject = JsObject(Map.empty[String, JsValue])
    def apply(members: (String, JsValue)*): JsObject = JsObject(members.toMap)
  }

  case class JsArray(elements: Vector[JsValue]) extends JsValue
  object JsArray {
    val empty: JsArray = JsArray(Vector.empty[JsValue])
    def apply(elements: JsValue*): JsArray = JsArray(elements.toVector)
  }

  case class JsString(value: String) extends JsValue

  case class JsNumber(value: BigDecimal) extends JsValue
  object JsNumber {
    def apply(n: Int): JsNumber = JsNumber(BigDecimal(n))
    def apply(n: Long): JsNumber = JsNumber(BigDecimal(n))
    def apply(n: Double): JsNumber = JsNumber(BigDecimal(n))
    def apply(n: Float): JsNumber = JsNumber(BigDecimal(n.toDouble))
    def apply(n: BigInt): JsNumber = JsNumber(BigDecimal(n))
    def apply(n: String): JsNumber = JsNumber(BigDecimal(n))
  }

  sealed abstract class JsBoolean extends JsValue {
    def value: Boolean
  }
  object JsBoolean {
    def apply(x: Boolean): JsBoolean = if (x) JsTrue else JsFalse
    def unapply(x: JsBoolean): Option[Boolean] = Some(x.value)
  }
  case object JsTrue extends JsBoolean { def value = true }
  case object JsFalse extends JsBoolean { def value = false }
  case object JsNull extends JsValue

  object JsPrinter {
    def escape(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
        case c => sb.append(c)
      }
      sb.toString
    }

    def print(v: JsValue, pretty: Boolean, indent: Int = 0): String = v match {
      case JsNull => "null"
      case JsTrue => "true"
      case JsFalse => "false"
      case JsNumber(n) => if (n.isWhole && n.isValidLong) n.toLong.toString else n.toString
      case JsString(s) => "\"" + escape(s) + "\""
      case JsArray(els) =>
        if (els.isEmpty) "[]"
        else if (!pretty) els.map(print(_, pretty)).mkString("[", ",", "]")
        else {
          val pad = "  " * (indent + 1)
          els.map(e => pad + print(e, pretty, indent + 1)).mkString("[\n", ",\n", "\n" + "  " * indent + "]")
        }
      case JsObject(fields) =>
        if (fields.isEmpty) "{}"
        else if (!pretty) fields.map { case (k, x) => "\"" + escape(k) + "\":" + print(x, pretty) }.mkString("{", ",", "}")
        else {
          val pad = "  " * (indent + 1)
          fields.map { case (k, x) => pad + "\"" + escape(k) + "\": " + print(x, pretty, indent + 1) }.mkString("{\n", ",\n", "\n" + "  " * indent + "}")
        }
    }
  }

  object JsonParser {
    def apply(input: String): JsValue = new JsonParser(input).parseValue()
  }

  class JsonParser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing = deserializationError(s"$msg at $pos in: $input")

    def parseValue(): JsValue = {
      ws()
      if (pos >= input.length) fail("unexpected end")
      input.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JsString(parseString())
        case 't' => expect("true"); JsTrue
        case 'f' => expect("false"); JsFalse
        case 'n' => expect("null"); JsNull
        case _ => parseNumber()
      }
    }

    private def expect(word: String): Unit = {
      if (!input.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length
    }

    private def parseObject(): JsObject = {
      pos += 1; ws()
      val fields = Map.newBuilder[String, JsValue]
      if (pos < input.length && input.charAt(pos) == '}') { pos += 1; return JsObject(fields.result()) }
      var done = false
      while (!done) {
        ws()
        val k = parseString()
        ws()
        if (input.charAt(pos) != ':') fail("expected :")
        pos += 1
        fields += k -> parseValue()
        ws()
        input.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case _ => fail("expected , or }")
        }
      }
      JsObject(fields.result())
    }

    private def parseArray(): JsArray = {
      pos += 1; ws()
      val els = Vector.newBuilder[JsValue]
      if (pos < input.length && input.charAt(pos) == ']') { pos += 1; return JsArray(els.result()) }
      var done = false
      while (!done) {
        els += parseValue()
        ws()
        input.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case _ => fail("expected , or ]")
        }
      }
      JsArray(els.result())
    }

    private def parseString(): String = {
      if (input.charAt(pos) != '"') fail("expected string")
      pos += 1
      val sb = new StringBuilder
      while (input.charAt(pos) != '"') {
        input.charAt(pos) match {
          case '\\' =>
            pos += 1
            input.charAt(pos) match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' => sb.append(Integer.parseInt(input.substring(pos + 1, pos + 5), 16).toChar); pos += 4
              case _ => fail("bad escape")
            }
          case c => sb.append(c)
        }
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): JsNumber = {
      val start = pos
      while (pos < input.length && ("+-0123456789.eE".indexOf(input.charAt(pos)) >= 0)) pos += 1
      JsNumber(BigDecimal(input.substring(start, pos)))
    }
  }

  trait JsonReader[T] {
    def read(json: JsValue): T
  }
  object JsonReader {
    implicit def func2Reader[T](f: JsValue => T): JsonReader[T] = (json: JsValue) => f(json)
  }

  trait JsonWriter[T] {
    def write(obj: T): JsValue
  }
  object JsonWriter {
    implicit def func2Writer[T](f: T => JsValue): JsonWriter[T] = (obj: T) => f(obj)
  }

  trait JsonFormat[T] extends JsonReader[T] with JsonWriter[T]
  trait RootJsonReader[T] extends JsonReader[T]
  trait RootJsonWriter[T] extends JsonWriter[T]
  trait RootJsonFormat[T] extends JsonFormat[T] with RootJsonReader[T] with RootJsonWriter[T]

  trait DefaultJsonProtocol {
    implicit val IntJsonFormat: JsonFormat[Int] = new JsonFormat[Int] {
      def write(x: Int): JsValue = JsNumber(x)
      def read(v: JsValue): Int = v match {
        case JsNumber(n) => n.toInt
        case x => deserializationError("int expected, got " + x)
      }
    }
    implicit val LongJsonFormat: JsonFormat[Long] = new JsonFormat[Long] {
      def write(x: Long): JsValue = JsNumber(x)
      def read(v: JsValue): Long = v match {
        case JsNumber(n) => n.toLong
        case x => deserializationError("long expected, got " + x)
      }
    }
    implicit val DoubleJsonFormat: JsonFormat[Double] = new JsonFormat[Double] {
      def write(x: Double): JsValue = JsNumber(x)
      def read(v: JsValue): Double = v match {
        case JsNumber(n) => n.toDouble
        case x => deserializationError("double expected, got " + x)
      }
    }
    implicit val FloatJsonFormat: JsonFormat[Float] = new JsonFormat[Float] {
      def write(x: Float): JsValue = JsNumber(x)
      def read(v: JsValue): Float = v match {
        case JsNumber(n) => n.toFloat
        case x => deserializationError("float expected, got " + x)
      }
    }
    implicit val StringJsonFormat: JsonFormat[String] = new JsonFormat[String] {
      def write(x: String): JsValue = JsString(x)
      def read(v: JsValue): String = v match {
        case JsString(s) => s
        case x => deserializationError("string expected, got " + x)
      }
    }
    implicit val BooleanJsonFormat: JsonFormat[Boolean] = new JsonFormat[Boolean] {
      def write(x: Boolean): JsValue = JsBoolean(x)
      def read(v: JsValue): Boolean = v match {
        case JsBoolean(b) => b
        case x => deserializationError("boolean expected, got " + x)
      }
    }
    implicit val JsValueJsonFormat: JsonFormat[JsValue] = new JsonFormat[JsValue] {
      def write(x: JsValue): JsValue = x
      def read(v: JsValue): JsValue = v
    }

    implicit def optionFormat[T](implicit tf: JsonFormat[T]): JsonFormat[Option[T]] = new JsonFormat[Option[T]] {
      def write(x: Option[T]): JsValue = x match {
        case Some(v) => tf.write(v)
        case None => JsNull
      }
      def read(v: JsValue): Option[T] = v match {
        case JsNull => None
        case x => Some(tf.read(x))
      }
    }

    implicit def listFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[List[T]] = new RootJsonFormat[List[T]] {
      def write(x: List[T]): JsValue = JsArray(x.map(tf.write).toVector)
      def read(v: JsValue): List[T] = v match {
        case JsArray(els) => els.map(tf.read).toList
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def vectorFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[Vector[T]] = new RootJsonFormat[Vector[T]] {
      def write(x: Vector[T]): JsValue = JsArray(x.map(tf.write))
      def read(v: JsValue): Vector[T] = v match {
        case JsArray(els) => els.map(tf.read)
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def seqFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[Seq[T]] = new RootJsonFormat[Seq[T]] {
      def write(x: Seq[T]): JsValue = JsArray(x.map(tf.write).toVector)
      def read(v: JsValue): Seq[T] = v match {
        case JsArray(els) => els.map(tf.read)
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def indexedSeqFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[IndexedSeq[T]] = new RootJsonFormat[IndexedSeq[T]] {
      def write(x: IndexedSeq[T]): JsValue = JsArray(x.map(tf.write).toVector)
      def read(v: JsValue): IndexedSeq[T] = v match {
        case JsArray(els) => els.map(tf.read)
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def iterableFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[Iterable[T]] = new RootJsonFormat[Iterable[T]] {
      def write(x: Iterable[T]): JsValue = JsArray(x.map(tf.write).toVector)
      def read(v: JsValue): Iterable[T] = v match {
        case JsArray(els) => els.map(tf.read)
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def setFormat[T](implicit tf: JsonFormat[T]): RootJsonFormat[Set[T]] = new RootJsonFormat[Set[T]] {
      def write(x: Set[T]): JsValue = JsArray(x.map(tf.write).toVector)
      def read(v: JsValue): Set[T] = v match {
        case JsArray(els) => els.map(tf.read).toSet
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit def mapFormat[K, V](implicit kf: JsonFormat[K], vf: JsonFormat[V]): RootJsonFormat[Map[K, V]] = new RootJsonFormat[Map[K, V]] {
      def write(x: Map[K, V]): JsValue = JsObject(x.map { case (k, v) =>
        kf.write(k) match {
          case JsString(s) => s -> vf.write(v)
          case other => serializationError("map key must be a string, got " + other)
        }
      })
      def read(v: JsValue): Map[K, V] = v match {
        case JsObject(fields) => fields.map { case (k, x) => kf.read(JsString(k)) -> vf.read(x) }
        case x => deserializationError("object expected, got " + x)
      }
    }

    implicit object RootJsArrayFormat extends RootJsonFormat[JsArray] {
      def write(x: JsArray): JsValue = x
      def read(v: JsValue): JsArray = v match {
        case a: JsArray => a
        case x => deserializationError("array expected, got " + x)
      }
    }

    implicit object RootJsObjectFormat extends RootJsonFormat[JsObject] {
      def write(x: JsObject): JsValue = x
      def read(v: JsValue): JsObject = v.asJsObject
    }

    def jsonFormat2[A, B, T <: Product](construct: (A, B) => T, f1: String, f2: String)(implicit af: JsonFormat[A], bf: JsonFormat[B]): RootJsonFormat[T] =
      new RootJsonFormat[T] {
        def write(x: T): JsValue = JsObject(f1 -> af.write(x.productElement(0).asInstanceOf[A]), f2 -> bf.write(x.productElement(1).asInstanceOf[B]))
        def read(v: JsValue): T = {
          val o = v.asJsObject
          construct(af.read(o.fields(f1)), bf.read(o.fields(f2)))
        }
      }

    def jsonFormat3[A, B, C, T <: Product](construct: (A, B, C) => T)(implicit af: JsonFormat[A], bf: JsonFormat[B], cf: JsonFormat[C], ct: scala.reflect.ClassTag[T]): RootJsonFormat[T] = {
      val names = ct.runtimeClass.getDeclaredFields.map(_.getName)
      jsonFormat3(construct, names(0), names(1), names(2))
    }

    def jsonFormat3[A, B, C, T <: Product](construct: (A, B, C) => T, f1: String, f2: String, f3: String)(implicit af: JsonFormat[A], bf: JsonFormat[B], cf: JsonFormat[C]): RootJsonFormat[T] =
      new RootJsonFormat[T] {
        def write(x: T): JsValue = JsObject(
          f1 -> af.write(x.productElement(0).asInstanceOf[A]),
          f2 -> bf.write(x.productElement(1).asInstanceOf[B]),
          f3 -> cf.write(x.productElement(2).asInstanceOf[C]))
        def read(v: JsValue): T = {
          val o = v.asJsObject
          construct(af.read(o.fields(f1)), bf.read(o.fields(f2)), cf.read(o.fields(f3)))
        }
      }
  }

  object DefaultJsonProtocol extends DefaultJsonProtocol
}
