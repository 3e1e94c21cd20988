// Minimal Apache Jena stand-in for offline compilation of the reference.
// Only the NT/TSV-independent surface the reference's data layer touches.
// Parsing bodies throw — the debug harness feeds triples directly.
package org.apache.jena

package datatypes {
  trait RDFDatatype {
    def getURI: String
  }

  package xsd {
    class XSDDatatype(name: String) extends org.apache.jena.datatypes.RDFDatatype {
      def getURI: String = "http://www.w3.org/2001/XMLSchema#" + name
    }
    object XSDDatatype {
      val XSDint = new XSDDatatype("int")
      val XSDinteger = new XSDDatatype("integer")
      val XSDdouble = new XSDDatatype("double")
      val XSDfloat = new XSDDatatype("float")
      val XSDlong = new XSDDatatype("long")
      val XSDshort = new XSDDatatype("short")
      val XSDbyte = new XSDDatatype("byte")
      val XSDboolean = new XSDDatatype("boolean")
      val XSDstring = new XSDDatatype("string")
    }
  }
}

package graph {
  class BlankNodeId(label: String) {
    def getLabelString: String = label
  }

  class LiteralLabel(lex: String, dtype: org.apache.jena.datatypes.RDFDatatype) {
    def isWellFormed: Boolean = false
    def getValue: AnyRef = lex
    def getLexicalForm: String = lex
    def getDatatype: org.apache.jena.datatypes.RDFDatatype = dtype
  }

  abstract class Node {
    def isURI: Boolean = this.isInstanceOf[Node_URI]
    def isBlank: Boolean = this.isInstanceOf[Node_Blank]
    def isLiteral: Boolean = this.isInstanceOf[Node_Literal]
  }

  class Node_URI(uri: String) extends Node {
    def getURI: String = uri
    override def toString: String = uri
  }

  class Node_Blank(id: String) extends Node {
    def getBlankNodeId: BlankNodeId = new BlankNodeId(id)
    override def toString: String = "_:" + id
  }

  class Node_Literal(lex: String, dtype: org.apache.jena.datatypes.RDFDatatype) extends Node {
    def getLiteral: LiteralLabel = new LiteralLabel(lex, dtype)
    def getLiteralLexicalForm: String = lex
    override def toString: String = lex
  }

  object NodeFactory {
    def createURI(uri: String): Node = new Node_URI(uri)
    def createBlankNode(id: String): Node = new Node_Blank(id)
    def createLiteral(lex: String): Node = new Node_Literal(lex, null)
    def createLiteral(lex: String, dtype: org.apache.jena.datatypes.RDFDatatype): Node = new Node_Literal(lex, dtype)
  }

  class Triple(s: Node, p: Node, o: Node) {
    def getSubject: Node = s
    def getPredicate: Node = p
    def getObject: Node = o
  }
}

package rdf.model.impl {
  object Util {
    // splitNamespaceXML: index of the first char of the local name
    def splitNamespaceXML(uri: String): Int = {
      val hash = uri.lastIndexOf('#')
      if (hash >= 0) return hash + 1
      val slash = uri.lastIndexOf('/')
      if (slash >= 0) slash + 1 else 0
    }
  }
}

package sparql.core {
  import org.apache.jena.graph.{Node, NodeFactory, Triple}

  class Quad(g: Node, t: Triple) {
    def this(g: Node, s: Node, p: Node, o: Node) = this(g, new Triple(s, p, o))
    def getGraph: Node = g
    def getSubject: Node = t.getSubject
    def getPredicate: Node = t.getPredicate
    def getObject: Node = t.getObject
    def asTriple(): Triple = t
  }

  object Quad {
    val defaultGraphIRI: Node = NodeFactory.createURI("urn:x-arq:DefaultGraph")
  }
}

package riot {
  class Lang(val name: String)

  object Lang {
    val NT = new Lang("NT")
    val NQ = new Lang("NQ")
    val TTL = new Lang("TTL")
    val TRIG = new Lang("TRIG")
    val TRIX = new Lang("TRIX")
    val JSONLD = new Lang("JSONLD")
    val RDFXML = new Lang("RDFXML")
    val N3 = new Lang("N3")
    val NTRIPLES = NT
    val TURTLE = TTL
  }

  object RDFLanguages {
    val NT: Lang = Lang.NT
    val NTRIPLES: Lang = Lang.NT
    val TTL: Lang = Lang.TTL
    val TURTLE: Lang = Lang.TTL
    val N3: Lang = Lang.N3
  }

  class RDFFormat(val lang: Lang) {
    def getLang: Lang = lang
  }

  object RDFFormat {
    val NTRIPLES_UTF8 = new RDFFormat(Lang.NT)
    val NQUADS_UTF8 = new RDFFormat(Lang.NQ)
    val TURTLE_FLAT = new RDFFormat(Lang.TTL)
    val TRIG_FLAT = new RDFFormat(Lang.TRIG)
    val TRIX = new RDFFormat(Lang.TRIX)
    val JSONLD = new RDFFormat(Lang.JSONLD)
    val RDFXML = new RDFFormat(Lang.RDFXML)
  }

  object RDFDataMgr {
    def parse(stream: org.apache.jena.riot.system.StreamRDF, is: java.io.InputStream, lang: Lang): Unit =
      throw new UnsupportedOperationException("jena stub: parsing unavailable offline")
  }

  class RDFParserBuilder {
    def source(is: java.io.InputStream): RDFParserBuilder = this
    def source(path: String): RDFParserBuilder = this
    def base(b: String): RDFParserBuilder = this
    def lang(l: Lang): RDFParserBuilder = this
    def context(c: AnyRef): RDFParserBuilder = this
    def checking(c: Boolean): RDFParserBuilder = this
    def parse(stream: org.apache.jena.riot.system.StreamRDF): Unit =
      throw new UnsupportedOperationException("jena stub: parsing unavailable offline")
  }

  object RDFParser {
    def create(): RDFParserBuilder = new RDFParserBuilder
  }

  package system {
    trait StreamRDF {
      def start(): Unit
      def finish(): Unit
      def base(base: String): Unit
      def prefix(prefix: String, iri: String): Unit
      def triple(triple: org.apache.jena.graph.Triple): Unit
      def quad(quad: org.apache.jena.sparql.core.Quad): Unit
    }

    object StreamRDFWriter {
      // N-Triples / N-Quads writing implemented from the W3C spec (the
      // grammar is canonical and trivial) so the REFERENCE's own export
      // path — TripleItem -> Jena Node mapping incl. XSD datatype
      // assignment (TripleItem.scala tripleItemToJenaNode) and the
      // RdfWriter streaming loop (JenaLang.scala) — can be executed
      // offline and pinned against the PySpark readers. Other formats
      // (Turtle/RDF-XML/...) are genuinely Jena serializer logic and
      // stay unavailable.
      def getWriterStream(os: java.io.OutputStream, format: org.apache.jena.riot.RDFFormat): StreamRDF = {
        val lang = format.getLang
        if (lang == Lang.NT || lang == Lang.NQ) new NtStreamWriter(os, lang == Lang.NQ)
        else throw new UnsupportedOperationException("jena stub: only NT/NQ writing offline")
      }
    }

    class NtStreamWriter(os: java.io.OutputStream, quads: Boolean) extends StreamRDF {
      private val w = new java.io.OutputStreamWriter(os, java.nio.charset.StandardCharsets.UTF_8)

      private def esc(s: String): String = {
        val sb = new StringBuilder
        s.foreach {
          case '\\' => sb.append("\\\\")
          case '"' => sb.append("\\\"")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c => sb.append(c)
        }
        sb.toString
      }

      private def term(n: org.apache.jena.graph.Node): String = n match {
        case u: org.apache.jena.graph.Node_URI => "<" + u.getURI + ">"
        case b: org.apache.jena.graph.Node_Blank => "_:" + b.getBlankNodeId.getLabelString
        case l: org.apache.jena.graph.Node_Literal =>
          val lit = l.getLiteral
          val base = "\"" + esc(lit.getLexicalForm) + "\""
          if (lit.getDatatype == null) base
          else base + "^^<" + lit.getDatatype.getURI + ">"
        case x => throw new IllegalArgumentException(String.valueOf(x))
      }

      def start(): Unit = {}

      def finish(): Unit = w.flush()

      def base(base: String): Unit = {}

      def prefix(prefix: String, iri: String): Unit = {}

      def triple(triple: org.apache.jena.graph.Triple): Unit =
        w.write(term(triple.getSubject) + " " + term(triple.getPredicate) + " " + term(triple.getObject) + " .\n")

      def quad(quad: org.apache.jena.sparql.core.Quad): Unit = {
        val g = quad.getGraph
        val gPart =
          if (g == null || g == org.apache.jena.sparql.core.Quad.defaultGraphIRI) ""
          else " " + term(g)
        w.write(term(quad.getSubject) + " " + term(quad.getPredicate) + " " + term(quad.getObject) + gPart + " .\n")
      }
    }
  }
}
