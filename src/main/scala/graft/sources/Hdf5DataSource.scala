package graft.sources

import java.util
import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PyLiteral._
import graft.sources.NexusTree.{NexusDataset, NexusGroup, NexusNode}

/** DataSource V2 surface over the pure-JVM [[Hdf5Reader]]:
  *
  * {{{
  *   spark.read.format("graft-hdf5").load("/data/raw")   // dir or file(s)
  * }}}
  *
  * yields one row per DATASET LEAF across every HDF5/NeXus file found —
  * the relational projection of the tree the ingest pipeline walks
  * (ref: src/scicat_nexus_helper.py:13-59 reads the same tree via h5py).
  *
  * Scale shape:
  *  - one [[InputPartition]] per FILE — HDF5 is not splittable (the
  *    superblock/B-tree layout needs whole-file random access), and at
  *    100 TB the unit of parallelism is the file population, so a
  *    1000-executor cluster gets file-granular tasks with no shuffle;
  *  - file-level predicates (`file = …`, `file LIKE 'prefix%'`,
  *    `file IN (…)`) are pushed INTO PLANNING — pruned files are never
  *    opened (the V2 analog of partition pruning);
  *  - `path` prefix/equality predicates are pushed into the reader and
  *    applied during the tree walk, before row materialization;
  *  - column pruning reaches the reader: unrequested columns (e.g. the
  *    attrs map) are never built.
  *
  * Failure semantics follow F11 (`mode=permissive`, the default): an
  * unreadable / corrupt / oversized file contributes zero rows instead
  * of failing the scan (ref: src/scicat_dataset.py:348-372 logs and
  * skips); `mode=failfast` rethrows for debugging.
  */
class Hdf5DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-hdf5"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Hdf5DataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Hdf5Table(properties.asScala.toMap)
}

object Hdf5DataSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("value_str", StringType, nullable = true),
    StructField("value_num", DoubleType, nullable = true),
    StructField("dims", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_elems", LongType, nullable = false),
    StructField("units", StringType, nullable = true),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  private val Extensions = Seq(".h5", ".hdf", ".hdf5", ".nxs", ".nexus")

  /** Expand the path/paths options: plain files pass through, directories
    * are walked recursively for known HDF5 extensions. */
  def listFiles(options: Map[String, String]): Seq[String] = {
    import java.nio.file.{Files, Path, Paths}
    val roots: Seq[String] = options.get("paths") match {
      case Some(json) => graft.schema.ConfigValue.fromJson(json) match {
        case s: graft.schema.ConfigValue.CSeq =>
          s.items.collect { case graft.schema.ConfigValue.CStr(p) => p }
        case _ => Seq.empty
      }
      case None => options.get("path").toSeq
    }
    roots.flatMap { r =>
      val p = Paths.get(r)
      if (Files.isDirectory(p)) {
        val stream = Files.walk(p)
        try stream.iterator().asScala
          .filter(f => Files.isRegularFile(f) &&
            Extensions.exists(f.getFileName.toString.toLowerCase.endsWith))
          .map(_.toString).toVector.sorted
        finally stream.close()
      } else Seq(p.toString)
    }
  }

  /** Flatten one parsed tree into (path, dataset) leaves, pre-filtered
    * by the pushed `path` predicates. */
  def leaves(root: NexusGroup, pathFilters: Seq[PathFilter]): Vector[(String, NexusDataset)] = {
    def keep(p: String): Boolean = pathFilters.forall(_.matches(p))
    // a prefix filter can also prune whole subtrees: a group at /a/b is
    // worth descending only if some passing path can start with /a/b/
    def mayDescend(p: String): Boolean = pathFilters.forall(_.mayContain(p))
    def walk(prefix: String, node: NexusNode): Vector[(String, NexusDataset)] = node match {
      case d: NexusDataset => if (keep(prefix)) Vector(prefix -> d) else Vector.empty
      case g: NexusGroup =>
        g.children.flatMap { case (name, child) =>
          val p = s"$prefix/$name"
          child match {
            case grp: NexusGroup => if (mayDescend(p)) walk(p, grp) else Vector.empty
            case _ => walk(p, child)
          }
        }
    }
    walk("", root)
  }

  /** The subset of Catalyst source filters the reader understands. */
  sealed trait PathFilter extends Serializable {
    def matches(p: String): Boolean
    def mayContain(groupPath: String): Boolean
  }
  final case class PathEquals(v: String) extends PathFilter {
    def matches(p: String): Boolean = p == v
    def mayContain(g: String): Boolean = v.startsWith(g + "/")
  }
  final case class PathPrefix(v: String) extends PathFilter {
    def matches(p: String): Boolean = p.startsWith(v)
    def mayContain(g: String): Boolean =
      (g + "/").startsWith(v) || v.startsWith(g + "/")
  }

  private[sources] def shape(v: PyValue): Vector[Int] = v match {
    case PyList(items) =>
      val inner = items.headOption.map(shape).getOrElse(Vector.empty)
      if (items.forall(i => shape(i) == inner)) items.size +: inner
      else Vector(items.size) // ragged: report outer dim only
    case _ => Vector.empty
  }

  private[sources] def leafType(v: PyValue): String = v match {
    case _: PyStr => "string"
    case _: PyInt => "int64"
    case _: PyFloat => "float64"
    case _: PyBool => "bool"
    case PyNone => "null"
    case _: PyDict => "struct"
    case PyList(items) =>
      s"array<${items.headOption.map(leafType).getOrElse("null")}>"
  }
}

private class Hdf5Table(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft-hdf5:${options.getOrElse("path", options.getOrElse("paths", "?"))}"
  override def schema(): StructType = Hdf5DataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new Hdf5ScanBuilder(options)
}

private class Hdf5ScanBuilder(options: Map[String, String]) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import Hdf5DataSource._

  private var required: StructType = Hdf5DataSource.schema
  private var fileFilters: Seq[String => Boolean] = Seq.empty
  private var pathFilters: Seq[PathFilter] = Seq.empty
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("file", _: String) | In("file", _) | StringStartsWith("file", _) => true
      case EqualTo("path", _: String) | StringStartsWith("path", _) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("file", v: String) => fileFilters :+= ((f: String) => f == v)
      case In("file", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        fileFilters :+= ((f: String) => set.contains(f))
      case StringStartsWith("file", v) => fileFilters :+= ((f: String) => f.startsWith(v))
      case EqualTo("path", v: String) => pathFilters :+= PathEquals(v)
      case StringStartsWith("path", v) => pathFilters :+= PathPrefix(v)
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new Hdf5Scan(options, required, fileFilters, pathFilters)
}

private class Hdf5Scan(options: Map[String, String], required: StructType,
    fileFilters: Seq[String => Boolean], pathFilters: Seq[Hdf5DataSource.PathFilter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-hdf5 files=${planInputPartitions().length} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Hdf5DataSource.listFiles(options)
      .filter(f => fileFilters.forall(_(f)))
      .map(f => Hdf5FilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new Hdf5ReaderFactory(required, pathFilters,
      failFast = options.get("mode").exists(_.equalsIgnoreCase("failfast")))
}

private case class Hdf5FilePartition(file: String) extends InputPartition

private class Hdf5ReaderFactory(required: StructType,
    pathFilters: Seq[Hdf5DataSource.PathFilter], failFast: Boolean)
    extends PartitionReaderFactory {
  import Hdf5DataSource._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[Hdf5FilePartition].file
    val tree: Option[NexusGroup] =
      if (failFast) Some(Hdf5Reader.read(file))
      else Hdf5Reader.readTreeClassified(file) match { // F11: unreadable -> 0 rows
        case Right(t) => Some(t)
        case Left(reason) =>
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"graft-hdf5 scan skipped ($reason): $file")
          None
      }
    val rows = tree.map(t => leaves(t, pathFilters)).getOrElse(Vector.empty).iterator
    val fileU = UTF8String.fromString(file)

    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else { current = toRow(rows.next()); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()

      private def toRow(leaf: (String, NexusDataset)): InternalRow = {
        val (path, ds) = leaf
        val dims = shape(ds.value)
        val row = new GenericInternalRow(required.length)
        var i = 0
        required.fields.foreach { f =>
          row.update(i, f.name match {
            case "file" => fileU
            case "path" => UTF8String.fromString(path)
            case "dtype" => UTF8String.fromString(leafType(ds.value))
            case "value_str" => UTF8String.fromString(pyStr(ds.value))
            case "value_num" => ds.value match {
              case PyInt(v) => java.lang.Double.valueOf(v.toDouble)
              case PyFloat(v) => java.lang.Double.valueOf(v)
              case _ => null
            }
            case "dims" => new GenericArrayData(dims.toArray)
            case "n_elems" =>
              java.lang.Long.valueOf(if (dims.isEmpty) 1L else dims.map(_.toLong).product)
            case "units" =>
              ds.attrs.get("units").map(UTF8String.fromString).orNull
            case "attrs" =>
              val ks = ds.attrs.keys.toArray.sorted
              new ArrayBasedMapData(
                new GenericArrayData(ks.map(UTF8String.fromString(_): Any)),
                new GenericArrayData(ks.map(k => UTF8String.fromString(ds.attrs(k)): Any)))
            case other => throw new IllegalArgumentException(s"unknown column $other")
          })
          i += 1
        }
        row
      }
    }
  }
}
