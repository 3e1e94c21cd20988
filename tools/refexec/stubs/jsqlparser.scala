// Minimal jsqlparser stand-in for offline compilation of the reference.
// Compile-only: the debug harness never parses SQL dumps.
package net.sf.jsqlparser {

  package statement {
    trait Statement
  }

  package schema {
    class SqlTable {
      def getName: String = throw new UnsupportedOperationException("jsqlparser stub")
    }
    class Column {
      def getColumnName: String = throw new UnsupportedOperationException("jsqlparser stub")
    }
  }

  package expression {
    trait Expression

    package operators.relational {
      class ExpressionList {
        def getExpressions: java.util.List[AnyRef] = throw new UnsupportedOperationException("jsqlparser stub")
      }
      class MultiExpressionList {
        def getExprList: java.util.List[ExpressionList] = throw new UnsupportedOperationException("jsqlparser stub")
      }
    }
  }

  package parser {
    class Token {
      var kind: Int = 0
    }
    class StreamProvider(is: java.io.InputStream, encoding: String)
    object CCJSqlParserConstants {
      val ST_SEMICOLON: Int = 1
      val EOF: Int = 0
    }
    class CCJSqlParser private () {
      def this(provider: StreamProvider) = this()
      def this(sql: String) = this()
      def setErrorRecovery(b: Boolean): Unit = ()
      def SingleStatement(): net.sf.jsqlparser.statement.Statement = throw new UnsupportedOperationException("jsqlparser stub")
      def getToken(i: Int): Token = throw new UnsupportedOperationException("jsqlparser stub")
      def getNextToken: Token = throw new UnsupportedOperationException("jsqlparser stub")
      def ColumnsNamesList(): java.util.List[String] = throw new UnsupportedOperationException("jsqlparser stub")
    }
  }

  package statement.create.table {
    class ColDataType {
      def getDataType: String = throw new UnsupportedOperationException("jsqlparser stub")
    }
    class ColumnDefinition {
      def getColumnName: String = throw new UnsupportedOperationException("jsqlparser stub")
      def getColDataType: ColDataType = throw new UnsupportedOperationException("jsqlparser stub")
      def getColumnSpecStrings: java.util.List[String] = throw new UnsupportedOperationException("jsqlparser stub")
    }
    class Index {
      def getType: String = throw new UnsupportedOperationException("jsqlparser stub")
      def getColumnsNames: java.util.List[String] = throw new UnsupportedOperationException("jsqlparser stub")
    }
    class ForeignKeyIndex extends Index {
      def getReferencedColumnNames: java.util.List[String] = throw new UnsupportedOperationException("jsqlparser stub")
      def getTable: net.sf.jsqlparser.schema.SqlTable = throw new UnsupportedOperationException("jsqlparser stub")
    }
    class CreateTable extends net.sf.jsqlparser.statement.Statement {
      def getIndexes: java.util.List[Index] = throw new UnsupportedOperationException("jsqlparser stub")
      def getColumnDefinitions: java.util.List[ColumnDefinition] = throw new UnsupportedOperationException("jsqlparser stub")
      def getTable: net.sf.jsqlparser.schema.SqlTable = throw new UnsupportedOperationException("jsqlparser stub")
    }
  }

  package statement.insert {
    class Insert extends net.sf.jsqlparser.statement.Statement {
      def getTable: net.sf.jsqlparser.schema.SqlTable = throw new UnsupportedOperationException("jsqlparser stub")
      def getColumns: java.util.List[net.sf.jsqlparser.schema.Column] = throw new UnsupportedOperationException("jsqlparser stub")
      def getItemsList: AnyRef = throw new UnsupportedOperationException("jsqlparser stub")
    }
  }
}
