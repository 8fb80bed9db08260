package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import scala.collection.mutable

/** SQL-text DDL entry point — accepts the literal DDL strings the
  * reference issues (`CREATE NAMESPACE IF NOT EXISTS …`; `CREATE TABLE
  * IF NOT EXISTS … (cols) USING iceberg PARTITIONED BY (days(col))
  * TBLPROPERTIES (…)` — reference spark/jobs/bronze_ingestion.py:94-121;
  * `ALTER TABLE … ADD COLUMN payment_method STRING COMMENT '…'` —
  * schema_add_column.py:24-28; `DESCRIBE t`) and routes them onto the
  * repo's spec-tested substitutes: [[PartitionTransforms]] hidden
  * partitioning for the write layout, mergeSchema evolution
  * ([[graft.sources.SchemaEvolution]]) for ADD COLUMN.
  *
  * A [[SqlDdl.Catalog]] is a warehouse directory: each table is a
  * parquet dir plus a `_graft_table.json` spec (schema, transforms,
  * properties), so a fresh catalog instance reattaches to existing
  * tables. The parser is deliberately small — the four statement
  * shapes the reference uses, tolerant of `--` comments, COMMENT
  * clauses and nested parens (DECIMAL(18,2), days(col)); it is an
  * entry-point adapter, not a SQL dialect.
  *
  * Scale: DDL is metadata-plane only (mkdir + a JSON marker); data
  * motion happens in [[Catalog.append]] which delegates to
  * `PartitionTransforms.writePartitioned` — bounded partition counts
  * and one writer task per partition value, same as the direct API.
  */
object SqlDdl {

  case class ColumnDef(name: String, sqlType: String, comment: Option[String]) {
    def dataType: DataType = DataType.fromDDL(sqlType)
  }

  /** One parsed partition transform: fn in {days months years hours
    * bucket truncate identity}, args = (width?, sourceCol). */
  case class TransformDef(fn: String, width: Option[Long], column: String) {
    /** The `_pt_` suffix this transform partitions under. */
    def name: String = fn match {
      case "days" => "day"
      case "months" => "month"
      case "years" => "year"
      case "hours" => "hour"
      case "identity" => column
      case f => s"${f}_$column"
    }
    def expr(schema: StructType): Column = fn match {
      case "days" => PartitionTransforms.days(col(column))
      case "months" => PartitionTransforms.months(col(column))
      case "years" => PartitionTransforms.years(col(column))
      case "hours" => PartitionTransforms.hours(col(column))
      case "bucket" => PartitionTransforms.bucket(width.get.toInt, col(column))
      case "truncate" =>
        val isString = schema.fields.find(_.name == column)
          .exists(_.dataType.typeName == "string")
        if (isString) PartitionTransforms.truncate(width.get.toInt, col(column))
        else PartitionTransforms.truncateNum(width.get, col(column))
      case "identity" => col(column)
      case other => throw new IllegalArgumentException(s"unknown transform: $other")
    }
  }

  case class TableSpec(name: String, columns: Seq[ColumnDef],
                       transforms: Seq[TransformDef],
                       properties: Map[String, String]) {
    def schema: StructType =
      StructType(columns.map(c => StructField(c.name, c.dataType)))
  }

  /** Outcome of one executed statement — `result` is non-empty for
    * DESCRIBE (col_name / data_type / comment rows, the reference
    * reads this shape from spark.sql("DESCRIBE …")). */
  case class DdlResult(statement: String, result: Option[DataFrame])

  class Catalog(spark: SparkSession, val warehouseDir: String) {
    private val specs = mutable.Map[String, TableSpec]()
    new java.io.File(warehouseDir).mkdirs()

    /** Path of a table (namespace dots become directory levels, so
      * `iceberg.bronze.t` and a bare `t` both resolve). */
    def tablePath(name: String): String =
      warehouseDir + "/" + name.replace('.', '/')

    private def specFile(name: String) =
      new java.io.File(tablePath(name), "_graft_table.json")

    /** Execute one DDL statement (the reference's four shapes). */
    def sql(ddl: String): DdlResult = {
      val text = stripLineComments(ddl).trim
      val upper = text.toUpperCase
      if (upper.startsWith("CREATE NAMESPACE")) createNamespace(text)
      else if (upper.startsWith("CREATE TABLE")) createTable(text)
      else if (upper.startsWith("ALTER TABLE")) alterAddColumn(text)
      else if (upper.startsWith("DESCRIBE")) describe(text)
      else if (upper.startsWith("INSERT INTO")) insertValues(text)
      else throw new IllegalArgumentException(
        s"unsupported DDL (supported: CREATE NAMESPACE / CREATE TABLE / " +
        s"ALTER TABLE ADD COLUMN / INSERT INTO … VALUES / DESCRIBE): ${text.take(60)}")
    }

    /** Append rows through the table's declared partition layout —
      * columns are aligned to the declared schema (by name, cast to
      * the declared types); evolution columns added after the create
      * ride along, pre-evolution files simply lack them. */
    def append(name: String, df: DataFrame): Unit = {
      val spec = specOf(name)
      val declared = spec.columns.map(c => col(c.name).cast(c.dataType))
      val aligned = df.select(declared: _*)
      if (spec.transforms.isEmpty)
        aligned.write.mode("append").option("compression", "snappy")
          .parquet(tablePath(name))
      else
        PartitionTransforms.writePartitioned(aligned, tablePath(name),
          spec.transforms.map(t => t.name -> t.expr(spec.schema)),
          mode = "append")
    }

    /** Read with schema merging so pre-evolution files surface NULL
      * for later-added columns (K6 semantics). */
    def read(name: String): DataFrame = {
      specOf(name)
      graft.sources.SchemaEvolution.readEvolved(spark, tablePath(name))
    }

    def specOf(name: String): TableSpec =
      specs.getOrElse(name, loadSpec(name).getOrElse(
        throw new IllegalArgumentException(s"no such table: $name")))

    private def createNamespace(text: String): DdlResult = {
      val m = "(?is)CREATE\\s+NAMESPACE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)".r
        .findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"bad CREATE NAMESPACE: $text"))
      val dir = new java.io.File(warehouseDir, m.group(2).replace('.', '/'))
      if (dir.exists() && m.group(1) == null)
        throw new IllegalArgumentException(s"namespace exists: ${m.group(2)}")
      dir.mkdirs()
      DdlResult(s"CREATE NAMESPACE ${m.group(2)}", None)
    }

    private def createTable(text: String): DdlResult = {
      val m = "(?is)CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*\\("
        .r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"bad CREATE TABLE: $text"))
      val name = m.group(2)
      val ifNotExists = m.group(1) != null
      if (specs.contains(name) || specFile(name).exists()) {
        if (ifNotExists) return DdlResult(s"CREATE TABLE $name (exists)", None)
        throw new IllegalArgumentException(s"table exists: $name")
      }
      val (colBlock, afterCols) = balancedParen(text, m.end - 1)
      val columns = splitTopLevel(colBlock).map(parseColumnDef)
      val transforms = "(?is)PARTITIONED\\s+BY\\s*\\(".r
        .findFirstMatchIn(afterCols).map { pm =>
          splitTopLevel(balancedParen(afterCols, pm.end - 1)._1)
            .map(parseTransform)
        }.getOrElse(Seq.empty)
      val properties = "(?is)TBLPROPERTIES\\s*\\(".r
        .findFirstMatchIn(afterCols).map { pm =>
          splitTopLevel(balancedParen(afterCols, pm.end - 1)._1).flatMap { kv =>
            "'([^']*)'\\s*=\\s*'([^']*)'".r.findFirstMatchIn(kv)
              .map(g => g.group(1) -> g.group(2))
          }.toMap
        }.getOrElse(Map.empty[String, String])
      // unknown partition source columns fail at CREATE, not first write
      transforms.foreach { t =>
        require(columns.exists(_.name == t.column),
          s"PARTITIONED BY references unknown column ${t.column}")
      }
      val spec = TableSpec(name, columns, transforms, properties)
      saveSpec(spec)
      DdlResult(s"CREATE TABLE $name", None)
    }

    private def alterAddColumn(text: String): DdlResult = {
      val m = ("(?is)ALTER\\s+TABLE\\s+([\\w.]+)\\s+ADD\\s+COLUMN[S]?\\s+" +
        "(\\w+)\\s+([\\w(),\\s]+?)(?:\\s+COMMENT\\s+'([^']*)')?\\s*$").r
        .findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"bad ALTER TABLE: $text"))
      val (name, colName) = (m.group(1), m.group(2))
      val spec = specOf(name)
      // idempotent like the reference's DESCRIBE-guarded flow: re-adding
      // the same column+type is a no-op, a type conflict is an error
      spec.columns.find(_.name == colName) match {
        case Some(existing) =>
          require(existing.sqlType.equalsIgnoreCase(m.group(3).trim),
            s"column $colName exists with type ${existing.sqlType}")
          DdlResult(s"ALTER TABLE $name (column $colName exists)", None)
        case None =>
          val updated = spec.copy(columns = spec.columns :+
            ColumnDef(colName, m.group(3).trim.toUpperCase, Option(m.group(4))))
          saveSpec(updated)
          DdlResult(s"ALTER TABLE $name ADD COLUMN $colName", None)
      }
    }

    /** `INSERT INTO t [(c1, …)] VALUES (v1, …), …` — the reference
      * demo's insert leg, completing the SQL-text schema-evolution
      * cycle (create → ALTER ADD COLUMN → insert WITH the new column →
      * DESCRIBE → old-rows-NULL verify). Literals: '…' strings ('' =
      * escaped quote), numeric/boolean tokens, NULL; every value is
      * aligned to the declared schema and cast through [[append]], so
      * inserted rows take the table's partition layout. Columns left
      * out of an explicit column list land as NULL — the mirror image
      * of pre-evolution files lacking a later-added column. VALUES
      * lists are demo/bootstrap-sized by nature (the reference inserts
      * 5 rows); bulk data goes through [[append]] with a DataFrame. */
    private def insertValues(text: String): DdlResult = {
      val m = "(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?([\\w.]+)\\s*".r
        .findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"bad INSERT: $text"))
      val name = m.group(1)
      val spec = specOf(name)
      var rest = text.substring(m.end)
      val columnsListed: Option[Seq[String]] =
        if (rest.trim.startsWith("(")) {
          val (block, after) = balancedParen(rest, rest.indexOf('('))
          rest = after
          Some(splitTopLevel(block).map(_.trim))
        } else None
      val vm = "(?is)^\\s*VALUES\\b".r.findFirstMatchIn(rest)
        .getOrElse(throw new IllegalArgumentException(s"bad INSERT (VALUES expected): $text"))
      val rows = splitTopLevel(rest.substring(vm.end)).map { rt =>
        val t = rt.trim
        require(t.startsWith("(") && t.endsWith(")"), s"bad VALUES row: $t")
        splitTopLevel(balancedParen(t, 0)._1).map(parseLiteral)
      }
      val target = columnsListed.getOrElse(spec.columns.map(_.name))
      target.foreach(c => require(spec.columns.exists(_.name == c),
        s"INSERT references unknown column $c"))
      rows.foreach(r => require(r.length == target.length,
        s"VALUES row arity ${r.length} != column count ${target.length}"))
      val pos = target.zipWithIndex.toMap
      // all-string staging rows; append() casts to the declared types
      val aligned: Seq[org.apache.spark.sql.Row] = rows.map { r =>
        org.apache.spark.sql.Row.fromSeq(
          spec.columns.map(c => pos.get(c.name).flatMap(r(_)).orNull))
      }
      val strSchema = StructType(spec.columns.map(c =>
        StructField(c.name, org.apache.spark.sql.types.StringType, nullable = true)))
      import scala.jdk.CollectionConverters._
      append(name, spark.createDataFrame(aligned.asJava, strSchema))
      DdlResult(s"INSERT INTO $name (${rows.length} rows)", None)
    }

    private def describe(text: String): DdlResult = {
      val name = text.split("\\s+").last
      val spec = specOf(name)
      import spark.implicits._
      val rows = spec.columns.map(c =>
        (c.name, c.dataType.simpleString, c.comment.getOrElse(""))) ++
        spec.transforms.zipWithIndex.map { case (t, i) =>
          (s"Part $i", s"${t.fn}(${t.column})", "partition transform") }
      DdlResult(s"DESCRIBE $name",
        Some(rows.toDF("col_name", "data_type", "comment")))
    }

    private def saveSpec(spec: TableSpec): Unit = {
      specs(spec.name) = spec
      val f = specFile(spec.name)
      f.getParentFile.mkdirs()
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val cols = spec.columns.map(c =>
        s"""{"name":${q(c.name)},"type":${q(c.sqlType)},"comment":${c.comment.map(q).getOrElse("null")}}""")
        .mkString("[", ",", "]")
      val trs = spec.transforms.map(t =>
        s"""{"fn":${q(t.fn)},"width":${t.width.getOrElse("null")},"column":${q(t.column)}}""")
        .mkString("[", ",", "]")
      val props = spec.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
      val json = s"""{"name":${q(spec.name)},"columns":$cols,"transforms":$trs,"properties":$props}"""
      java.nio.file.Files.writeString(f.toPath, json)
    }

    /** Reattach to a table created by an earlier catalog instance —
      * regex-decoded (flat schema, writer above; keys are fixed). */
    private def loadSpec(name: String): Option[TableSpec] = {
      val f = specFile(name)
      if (!f.exists()) return None
      val json = java.nio.file.Files.readString(f.toPath)
      val cols = """\{"name":"(\w+)","type":"([^"]+)","comment":(?:"((?:[^"\\]|\\.)*)"|null)\}""".r
        .findAllMatchIn(json.substring(json.indexOf("\"columns\"")))
        .map(m => ColumnDef(m.group(1), m.group(2),
          Option(m.group(3)).map(_.replace("\\\"", "\"").replace("\\\\", "\\"))))
        .toSeq
      val trsStart = json.indexOf("\"transforms\"")
      val propsStart = json.indexOf("\"properties\"")
      val trs = """\{"fn":"(\w+)","width":(\d+|null),"column":"(\w+)"\}""".r
        .findAllMatchIn(json.substring(trsStart, propsStart))
        .map(m => TransformDef(m.group(1),
          Option(m.group(2)).filter(_ != "null").map(_.toLong), m.group(3)))
        .toSeq
      val props = """"([^"]+)":"([^"]*)"""".r
        .findAllMatchIn(json.substring(propsStart + 13))
        .map(m => m.group(1) -> m.group(2)).toMap
      val spec = TableSpec(name, cols, trs, props)
      specs(name) = spec
      Some(spec)
    }
  }

  /** Drop `-- …` comments (the reference's DDL carries them inline). */
  private[sink] def stripLineComments(s: String): String =
    s.linesIterator.map { line =>
      val i = line.indexOf("--")
      if (i >= 0) line.substring(0, i) else line
    }.mkString("\n")

  /** Content of the parenthesized block opening at `open` (balanced,
    * quote-aware — parens inside '…' literals don't count), plus the
    * text after its close. */
  private[sink] def balancedParen(s: String, open: Int): (String, String) = {
    var depth = 0
    var inQuote = false
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote =>
          depth -= 1
          if (depth == 0) return (s.substring(open + 1, i), s.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens after ${s.substring(open).take(40)}")
  }

  /** Split on commas at paren depth 0 outside '…' literals (keeps
    * DECIMAL(18,2), bucket(16, col) and COMMENT 'view, cart' intact),
    * dropping empty segments. */
  private[sink] def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur.append('\'')
      case '(' if !inQuote => depth += 1; cur.append('(')
      case ')' if !inQuote => depth -= 1; cur.append(')')
      case ',' if depth == 0 && !inQuote => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** One VALUES literal → Option[String] (None = SQL NULL): quoted
    * strings lose their quotes ('' unescapes), bare tokens (numbers,
    * booleans, dates) pass through for the schema-directed cast. */
  private[sink] def parseLiteral(s: String): Option[String] = s.trim match {
    case t if t.equalsIgnoreCase("NULL") => None
    case t if t.length >= 2 && t.startsWith("'") && t.endsWith("'") =>
      Some(t.substring(1, t.length - 1).replace("''", "'"))
    case t => Some(t)
  }

  private[sink] def parseColumnDef(s: String): ColumnDef = {
    val m = "(?is)^(\\w+)\\s+([\\w(),\\s]+?)(?:\\s+COMMENT\\s+'([^']*)')?$".r
      .findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"bad column def: $s"))
    ColumnDef(m.group(1), m.group(2).trim.toUpperCase, Option(m.group(3)))
  }

  private[sink] def parseTransform(s: String): TransformDef = s.trim match {
    case t if !t.contains("(") => TransformDef("identity", None, t)
    case t =>
      val m = "(?is)^(\\w+)\\s*\\(([^)]*)\\)$".r.findFirstMatchIn(t)
        .getOrElse(throw new IllegalArgumentException(s"bad transform: $t"))
      val args = m.group(2).split(",").map(_.trim)
      m.group(1).toLowerCase match {
        case f @ ("days" | "months" | "years" | "hours" | "date") =>
          TransformDef(if (f == "date") "days" else f, None, args(0))
        case f @ ("bucket" | "truncate") =>
          require(args.length == 2, s"$f needs (width, column): $t")
          TransformDef(f, Some(args(0).toLong), args(1))
        case other => throw new IllegalArgumentException(s"unknown transform: $other")
      }
  }
}
