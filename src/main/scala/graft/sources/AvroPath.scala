package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's AvroPath selection DSL (geomesa-convert-avro/.../
  * AvroPath.scala; AvroPathTest) over Spark's nested column algebra:
  *
  *   /a/b                nested record access      -> getField chain
  *   /arr[$k=lat]        first array element whose
  *                       field k equals "lat"      -> filter(...) HOF + element_at
  *   /arr[$k=lat]/v      then a field of it
  *   /content$type=TObj  union branch selection    -> accepted and ignored
  *
  * Union-by-type is a no-op here by design: Avro unions beyond
  * `[null, T]` don't exist in a Spark schema — the read resolves each
  * column to ONE concrete type — so the branch the reference selects at
  * runtime is already selected at schema time. Missing array matches
  * yield null (the reference's None). Everything compiles to built-in
  * functions (getField / filter / element_at), no UDF. */
object AvroPath {

  private val Segment = """([A-Za-z_][A-Za-z0-9_]*)(\$type=[A-Za-z0-9_]+)?(\[\$([A-Za-z_][A-Za-z0-9_]*)=([^\]]+)\])?""".r

  /** Path rooted at top-level columns ("/content/..."). */
  def column(path: String): Column = resolve(None, path)

  /** Path applied over a record-valued column — the transform-language
    * form `avroPath($1, '/path')`. */
  def over(base: Column, path: String): Column = resolve(Some(base), path)

  private def resolve(start: Option[Column], path: String): Column = {
    require(path.startsWith("/"), s"avro path must start with '/': $path")
    val segs = path.split('/').toSeq.filter(_.nonEmpty)
    require(segs.nonEmpty, s"empty avro path: $path")
    segs.foldLeft(start) { (cur, seg) =>
      seg match {
        case Segment(name, _, bracket, predField, predValue) =>
          val base = cur match {
            case None => col(name)
            case Some(c) => c.getField(name)
          }
          val selected =
            if (bracket == null) base
            // try_element_at: an empty match yields null (the
            // reference's None) instead of an ANSI index error
            else try_element_at(filter(base, x => x.getField(predField) === lit(predValue)), lit(1))
          Some(selected)
        case other => throw new IllegalArgumentException(s"invalid avro path segment '$other' in $path")
      }
    }.get
  }
}
