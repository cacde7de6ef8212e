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

/** groupBy-able common-path aggregate. The buffer is Option-wrapped so
  * the no-input-yet zero is distinct from a legitimately empty common
  * prefix (relative paths with disjoint roots): with a bare
  * empty-Vector sentinel, merge would resurrect a path after the common
  * prefix collapsed — reduce('a/x','b/y','a/z') must yield "" (no
  * common segments), not 'a/z'. */
class CommonPathAggregator extends Aggregator[String, Option[Vector[String]], String] {

  override def zero: Option[Vector[String]] = None

  override def reduce(buf: Option[Vector[String]], path: String): Option[Vector[String]] =
    if (path == null || path.isEmpty) buf
    else buf match {
      case None => Some(CommonPath.split(path))
      case Some(segs) => Some(CommonPath.commonSegments(segs, CommonPath.split(path)))
    }

  override def merge(a: Option[Vector[String]], b: Option[Vector[String]]): Option[Vector[String]] =
    (a, b) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(x), Some(y)) => Some(CommonPath.commonSegments(x, y))
    }

  override def finish(buf: Option[Vector[String]]): String =
    buf match {
      case None => null
      case Some(segs) => CommonPath.join(segs)
    }

  override def bufferEncoder: Encoder[Option[Vector[String]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
