package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `os.path.commonpath` as a typed Aggregator — the A3 source-folder
  * aggregate (ref: _define_dataset_source_folder,
  * src/scicat_dataset.py:1013-1029).
  *
  * Two forms:
  *  - [[commonPath]]: scalar over a Seq (per-dataset file list — the
  *    reference's exact use);
  *  - [[CommonPathAggregator]]: `Aggregator[String, _, String]` for
  *    groupBy aggregation over many rows. Both partial-aggregate
  *    cleanly (merge = segment-wise common prefix), so at scale the
  *    shuffle carries one prefix per partition, not the path set.
  */
object CommonPath {

  /** Segment-wise common prefix; absolute paths keep their leading
    * empty segment so the result stays absolute. */
  def commonSegments(a: Vector[String], b: Vector[String]): Vector[String] =
    a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

  def split(p: String): Vector[String] = {
    // normalize: strip trailing slashes (but keep root "/")
    val trimmed = if (p.length > 1) p.reverse.dropWhile(_ == '/').reverse else p
    trimmed.split("/", -1).toVector
  }

  def join(segs: Vector[String]): String = {
    val s = segs.mkString("/")
    if (s.isEmpty && segs.nonEmpty) "/" else s
  }

  /** commonpath of a list; None for empty input (python raises). */
  def commonPath(paths: Seq[String]): Option[String] = {
    val valid = paths.filter(p => p != null && p.nonEmpty)
    if (valid.isEmpty) None
    else Some(join(valid.map(split).reduce(commonSegments)))
  }
}

/** groupBy-able common-path aggregate; buffer = the running common
  * segment prefix (empty Vector = no input yet, a non-path sentinel). */
class CommonPathAggregator extends Aggregator[String, Vector[String], String] {
  private val Empty: Vector[String] = Vector.empty

  override def zero: Vector[String] = Empty

  override def reduce(buf: Vector[String], path: String): Vector[String] =
    if (path == null || path.isEmpty) buf
    else if (buf.isEmpty) CommonPath.split(path)
    else CommonPath.commonSegments(buf, CommonPath.split(path))

  override def merge(a: Vector[String], b: Vector[String]): Vector[String] =
    if (a.isEmpty) b else if (b.isEmpty) a else CommonPath.commonSegments(a, b)

  override def finish(buf: Vector[String]): String =
    if (buf.isEmpty) null else CommonPath.join(buf)

  override def bufferEncoder: Encoder[Vector[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
