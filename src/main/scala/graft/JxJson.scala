package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.Catalog

/** JX JSON-query front door (SURVEY.md §3.2 entry 2).
  *
  * Accepts the reference's query shape —
  * {"from": t, "select": …, "where": …, "groupby": …, "sort": …,
  * "limit": n} with JX expression objects ({"eq": ["col", v]},
  * {"and": […]}, {"missing": "col"}, …) — and compiles it onto the
  * same DataFrame builder calls every other entry point uses: one
  * compile step, zero new execution machinery, Catalyst sees exactly
  * the plan a hand-written query would produce (SURVEY §3.1 [P] for
  * the reference lifecycle being mirrored).
  *
  * Expression semantics follow SURVEY §1.4: SQL/DuckDB null logic, with
  * JX's tolerant ops surfaced as explicit functions (missing/exists/
  * coalesce).
  */
object JxJson {

  def run(spark: SparkSession, sfDir: String, queryJson: String): DataFrame = {
    val q = JsonMethods.parse(queryJson)
    val from = (q \ "from") match {
      case JString(t) => t
      case other => sys.error(s"jx: 'from' must be a table name, got $other")
    }
    var df = Catalog.table(spark, sfDir, from)

    (q \ "where") match {
      case JNothing | JNull => ()
      case w => df = df.filter(compile(w))
    }

    val groupby: Seq[String] = (q \ "groupby") match {
      case JNothing | JNull => Seq.empty
      case JString(g) => Seq(g)
      case JArray(gs) => gs.map { case JString(g) => g; case other =>
        sys.error(s"jx: groupby entry $other") }
      case other => sys.error(s"jx: groupby $other")
    }

    // select: string | {name, value, aggregate} | array of those
    val selects: Seq[JValue] = (q \ "select") match {
      case JNothing | JNull => Seq.empty
      case JArray(ss) => ss
      case s => Seq(s)
    }

    if (groupby.nonEmpty) {
      val aggs = selects.map(aggColumn)
      df = df.groupBy(groupby.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    } else if (selects.exists(s => (s \ "aggregate") != JNothing)) {
      val aggs = selects.map(aggColumn)
      df = df.agg(aggs.head, aggs.tail: _*)
    } else if (selects.nonEmpty) {
      df = df.select(selects.map(selColumn): _*)
    }

    (q \ "sort") match {
      case JNothing | JNull => ()
      case s =>
        val keys = (s match { case JArray(xs) => xs; case x => Seq(x) })
          .map {
            case JString(k) => asc(k)
            case o: JObject =>
              val v = (o \ "value") match { case JString(k) => k
                case other => sys.error(s"jx: sort value $other") }
              (o \ "sort") match {
                case JString("desc") => desc(v)
                case _ => asc(v)
              }
            case other => sys.error(s"jx: sort $other")
          }
        df = df.orderBy(keys: _*)
    }

    (q \ "limit") match {
      case JInt(n) => df = df.limit(n.toInt)
      case _ => ()
    }
    df
  }

  private def aggColumn(s: JValue): Column = s match {
    case o: JObject =>
      val value = (o \ "value") match {
        case JString(v) => col(v)
        case JNothing | JNull => lit(1)
        case e => compile(e)
      }
      val out = (o \ "name") match {
        case JString(n) => n
        case _ => (o \ "value") match {
          case JString(v) => v; case _ => "value" }
      }
      val agg = (o \ "aggregate") match {
        case JString(a) => a; case _ => "count" }
      (agg match {
        case "count" => count(value)
        case "sum" => sum(value)
        case "minimum" | "min" => min(value)
        case "maximum" | "max" => max(value)
        case "average" | "avg" => avg(value)
        case "cardinality" => count_distinct(value)
        case "median" => expr(s"percentile(${value.toString}, 0.5)")
        case other => sys.error(s"jx: aggregate '$other'")
      }).as(out)
    case other => sys.error(s"jx: aggregate select $other")
  }

  private def selColumn(s: JValue): Column = s match {
    case JString(v) => col(v)
    case o: JObject =>
      val c = (o \ "value") match {
        case JString(v) => col(v)
        case e => compile(e)
      }
      (o \ "name") match { case JString(n) => c.as(n); case _ => c }
    case other => sys.error(s"jx: select $other")
  }

  /** JX expression object → Column. Variables are strings on the
    * operand side; bare literals are literals. */
  def compile(e: JValue): Column = e match {
    case JObject(List((op, args))) => op match {
      case "eq"  => bin(args)(_ === _)
      case "ne"  => bin(args)(_ =!= _)
      case "gt"  => bin(args)(_ > _)
      case "gte" => bin(args)(_ >= _)
      case "lt"  => bin(args)(_ < _)
      case "lte" => bin(args)(_ <= _)
      case "and" => varargs(args).reduce(_ && _)
      case "or"  => varargs(args).reduce(_ || _)
      case "not" => !compile(args)
      case "missing" => operand(args).isNull
      case "exists"  => operand(args).isNotNull
      case "in" => args match {
        case JArray(JString(v) :: JArray(vals) :: Nil) =>
          col(v).isin(vals.map(litOf): _*)
        case other => sys.error(s"jx: in $other")
      }
      case "prefix" => bin(args)((c, p) => c.startsWith(p))
      case "suffix" => bin(args)((c, p) => c.endsWith(p))
      case "coalesce" => coalesce(varargs(args): _*)
      case "add"  => varargs(args).reduce(_ + _)
      case "sub"  => bin(args)(_ - _)
      case "mult" => varargs(args).reduce(_ * _)
      case "div"  => bin(args)(_ / _)
      case "literal" => lit(litOf(args))
      case other => sys.error(s"jx: op '$other'")
    }
    case JString(v) => col(v)
    case other => lit(litOf(other))
  }

  private def bin(args: JValue)(f: (Column, Column) => Column): Column =
    args match {
      case JArray(a :: b :: Nil) => f(operand(a), operand(b))
      case other => sys.error(s"jx: binary args $other")
    }

  private def varargs(args: JValue): Seq[Column] = args match {
    case JArray(xs) => xs.map(operand)
    case x => Seq(operand(x))
  }

  /** Operand position: strings are column refs (JX convention);
    * {"literal": x} forces a literal. */
  private def operand(v: JValue): Column = v match {
    case JString(s) => col(s)
    case JObject(List(("literal", l))) => lit(litOf(l))
    case o: JObject => compile(o)
    case other => lit(litOf(other))
  }

  private def litOf(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull => null
    case other => sys.error(s"jx: literal $other")
  }
}
