package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods

/** mo_dots `leaves` (SURVEY.md §1.1, §2.10 udtf_leaves): flatten a
  * (possibly nested) JSON document into (dotted.path, value) pairs —
  * one output row per scalar leaf, array elements addressed by index.
  *
  * Implemented as a typed flatMap over the Dataset (the generator
  * surface); json4s ships inside Spark so there is no extra dependency.
  * Values are rendered canonically (JSON number/string/bool text) so
  * the result is engine-comparable.
  */
object Leaves {

  def leaves(json: String): Seq[(String, String)] =
    if (json == null) Seq.empty
    else
      try walk(JsonMethods.parse(json), "")
      catch { case _: Exception => Seq.empty }

  private def walk(v: JValue, prefix: String): Seq[(String, String)] = v match {
    case JObject(fields) =>
      fields.flatMap { case (k, cv) =>
        walk(cv, if (prefix.isEmpty) k else s"$prefix.$k")
      }
    case JArray(items) =>
      items.zipWithIndex.flatMap { case (cv, i) => walk(cv, s"$prefix.$i") }
    case JString(s)  => Seq(prefix -> s)
    case JInt(i)     => Seq(prefix -> i.toString)
    case JLong(l)    => Seq(prefix -> l.toString)
    case JDouble(d)  => Seq(prefix -> d.toString)
    case JDecimal(d) => Seq(prefix -> d.toString)
    case JBool(b)    => Seq(prefix -> b.toString)
    case JNull | JNothing => Seq.empty
    case JSet(items) => items.toSeq.flatMap(walk(_, prefix))
  }

  /** id + JSON column → (id, path, value) rows. */
  def explodeLeaves(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(jsonCol)).as[(Long, String)]
    ds.flatMap { case (id, json) =>
        leaves(json).map { case (p, v) => (id, p, v) }
      }
      .toDF(idCol, "path", "value")
  }
}
