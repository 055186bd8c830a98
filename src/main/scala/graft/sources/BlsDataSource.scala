package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 packaging of the BLS time-series text format
  * (SURVEY.md §2.1 S1 + §1.2 parse semantics):
  * `spark.read.format("bls").load(path)` yields the canonical
  * `(series_id string, year int, period string, value double)` rows
  * with the header/blank/malformed/footnote handling done inside the
  * source — plus column pruning pushed into the reader, so a
  * `select(series_id)` never materializes the other fields.
  *
  * One input partition per file (BLS files are single small text
  * files; a production variant would split by byte ranges like
  * FileScanRDD).
  */
class BlsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "bls"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlsDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("bls source requires a path"))
    new BlsTable(path)
  }
}

object BlsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("series_id", StringType),
    StructField("year", IntegerType),
    StructField("period", StringType),
    StructField("value", DoubleType)))

  /** The S1/X1–X5/F1–F2 parse semantics on one line: split on \s+,
    * tokens 0..3, null-on-failure numeric casts, drop the row unless
    * all four fields parse (header and junk lines fall out here).
    */
  def parseLine(line: String): Option[(String, Int, String, Double)] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None
    val toks = trimmed.split("\\s+")
    if (toks.length < 4) return None
    val year = toks(1).toIntOption
    val value = toks(3).toDoubleOption
    (year, value) match {
      case (Some(y), Some(v)) => Some((toks(0), y, toks(2), v))
      case _ => None
    }
  }
}

final class BlsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"bls($path)"
  override def schema(): StructType = BlsDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // capture the SESSION Hadoop conf (spark.hadoop.* credentials,
    // filesystem impls) as a serializable map — a bare Configuration()
    // would silently drop it on non-local filesystems
    val confMap = org.apache.spark.sql.graftshim.SparkShims
      .sessionHadoopConfMap(org.apache.spark.sql.SparkSession.active)
    new BlsScanBuilder(path, confMap)
  }
}

object HadoopConf {
  def from(confMap: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

final class BlsScanBuilder(path: String, confMap: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = BlsDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new BlsScan(path, required, confMap)
}

final class BlsScan(path: String, required: StructType, confMap: Map[String, String])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(HadoopConf.from(confMap))
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
      else Array(path)
    files.map(f => BlsInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlsReaderFactory(required, confMap)
}

final case class BlsInputPartition(file: String) extends InputPartition

final class BlsReaderFactory(required: StructType, confMap: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BlsPartitionReader(partition.asInstanceOf[BlsInputPartition].file, required, confMap)
}

final class BlsPartitionReader(file: String, required: StructType, confMap: Map[String, String])
  extends PartitionReader[InternalRow] {

  private val p = new org.apache.hadoop.fs.Path(file)
  private val in = p.getFileSystem(HadoopConf.from(confMap)).open(p)
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  // emit only the pruned columns, in the requested order
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(BlsDataSource.schema.fieldIndex)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      BlsDataSource.parseLine(lines.next()) match {
        case Some((sid, year, period, value)) =>
          val full = Array[Any](
            UTF8String.fromString(sid), year, UTF8String.fromString(period), value)
          current = InternalRow.fromSeq(fieldIdx.map(full).toSeq)
          return true
        case None => // header / blank / malformed — skip
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()
}
