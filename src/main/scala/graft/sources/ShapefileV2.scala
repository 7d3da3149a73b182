package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.GeomCodec

/** DataSource V2 shapefile connector: `spark.read.format("shapefile")
  * .load(path)` where path is one `.shp` or a directory of them.
  *
  * The reference imports shapefiles through a single-threaded GeoTools
  * reader (reference: server-plugin/.../ShapefileImporter.java); the V1
  * path here ([[Shapefile.importShapefile]]) is likewise a driver-side
  * parse. This connector makes the scan CLUSTER-SHAPED:
  *
  *  - **Splittable within one file.** The `.shx` sidecar is a fixed-width
  *    record index (offset + length per record, 8 bytes each); planning
  *    reads ONLY it and cuts the record stream into
  *    `maxRecordsPerPartition` slices with exact byte ranges, so one
  *    multi-GB .shp scans as many parallel tasks, each seeking straight
  *    to its slice — the same trick the OSM PBF reader plays with blob
  *    offsets.
  *  - **Column pruning.** The pruned schema reaches the reader: attribute
  *    columns come from seekable fixed-width `.dbf` records only when
  *    requested, and geometry parsing is skipped entirely for
  *    attribute-only scans (`ReadSchema` in `.explain` shows the cut).
  *
  * Schema: `rec_no INT, geometry BINARY (WKB)`, then one STRING column
  * per `.dbf` field (the V1 reader's convention).
  */
class ShapefileDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shapefile"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShapefileV2.schemaFor(ShapefileV2.resolvePaths(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShapefileTable(schema, properties.get("path"),
      Option(properties.get("maxRecordsPerPartition")).map(_.toInt)
        .getOrElse(ShapefileV2.DefaultMaxRecords))
}

class ShapefileTable(schema: StructType, path: String, maxRecs: Int)
    extends Table with SupportsRead {
  override def name(): String = s"shapefile($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShapefileScanBuilder(schema, ShapefileV2.shpFiles(path), maxRecs)
}

class ShapefileScanBuilder(full: StructType, files: Seq[String], maxRecs: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  /** rec_no range predicates prune whole .shx slices at PLANNING time; the
    * filters are still returned as residual, so Spark re-checks rows and
    * the pruning only ever has to be conservative.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThan("rec_no", _: Int) | GreaterThanOrEqual("rec_no", _: Int) |
           LessThan("rec_no", _: Int) | LessThanOrEqual("rec_no", _: Int) |
           EqualTo("rec_no", _: Int) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ShapefileScan(full, required, files, maxRecs,
    ShapefileV2.recNoBounds(pushed))
}

class ShapefileScan(full: StructType, required: StructType, files: Seq[String],
    maxRecs: Int, bounds: (Int, Int)) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap(f => ShapefileV2.partitionsOf(f, maxRecs))
      .filter(p => p.recEnd > bounds._1 && p.recStart <= bounds._2)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShapefileReaderFactory(full, required)
}

class ShapefileReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShapefileRecordReader(partition.asInstanceOf[ShapefileV2.ShpPartition],
      full, required)
}

/** Reads one record slice: the .shp byte range in one pread, .dbf rows by
  * fixed-width seek, emitting only the pruned columns.
  */
class ShapefileRecordReader(p: ShapefileV2.ShpPartition, full: StructType,
    required: StructType) extends PartitionReader[InternalRow] {

  private val needGeom = required.fieldNames.contains("geometry")
  private val dbfFieldNames = full.fieldNames.drop(2)
  private val neededDbf = dbfFieldNames.filter(required.fieldNames.contains)

  private val rows: Iterator[InternalRow] = {
    val geoms: Map[Int, Array[Byte]] =
      if (needGeom) ShapefileV2.readRangeWkb(p) else Map.empty
    val attrs: Map[Int, Map[String, String]] =
      if (neededDbf.nonEmpty)
        ShapefileV2.readDbfRange(p.shpPath, p.recStart, p.recEnd, neededDbf.toSeq)
      else Map.empty
    (p.recStart until p.recEnd).iterator.map { recNo =>
      val vals: Array[Any] = required.fieldNames.map {
        case "rec_no" => recNo
        case "geometry" => geoms.get(recNo).orNull
        case f => attrs.get(recNo).flatMap(_.get(f)).map(UTF8String.fromString).orNull
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object ShapefileV2 {

  val DefaultMaxRecords = 8192

  /** Conservative [lo, hi] record-number bounds implied by pushed rec_no
    * filters (inclusive; unconstrained = full int range).
    */
  def recNoBounds(pushed: Array[org.apache.spark.sql.sources.Filter]): (Int, Int) = {
    import org.apache.spark.sql.sources._
    pushed.foldLeft((Int.MinValue, Int.MaxValue)) {
      case ((lo, hi), GreaterThan("rec_no", v: Int)) => (math.max(lo, v + 1), hi)
      case ((lo, hi), GreaterThanOrEqual("rec_no", v: Int)) => (math.max(lo, v), hi)
      case ((lo, hi), LessThan("rec_no", v: Int)) => (lo, math.min(hi, v - 1))
      case ((lo, hi), LessThanOrEqual("rec_no", v: Int)) => (lo, math.min(hi, v))
      case ((lo, hi), EqualTo("rec_no", v: Int)) => (math.max(lo, v), math.min(hi, v))
      case (acc, _) => acc
    }
  }

  /** One slice of one .shp: records [recStart, recEnd) (1-based numbers)
    * living in bytes [byteStart, byteEnd) — cut from the .shx index at
    * planning time, so the reader seeks, never scans.
    */
  case class ShpPartition(shpPath: String, recStart: Int, recEnd: Int,
      byteStart: Long, byteEnd: Long) extends InputPartition

  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] =
    shpFiles(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("shapefile source needs a path")))

  def shpFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles).map(_.toSeq).getOrElse(Nil)
        .filter(x => x.isFile && x.getName.endsWith(".shp"))
        .map(_.getAbsolutePath).sorted
    else Seq(path)
  }

  /** Schema = fixed prefix + the first file's .dbf fields (all files in a
    * directory must share the layout, the usual tiled-extract convention).
    */
  def schemaFor(files: Seq[String]): StructType = {
    val base = Seq(StructField("rec_no", IntegerType, nullable = false),
      StructField("geometry", BinaryType, nullable = true))
    val dbf = files.headOption.map(dbfHeader(_)._1).getOrElse(Nil)
    StructType(base ++ dbf.map(n => StructField(n, StringType, nullable = true)))
  }

  /** .dbf header: (field names, field lengths, headerLen, recordLen, n). */
  private def dbfHeader(shpPath: String): (Seq[String], Seq[Int], Int, Int, Int) = {
    val dbfPath = shpPath.stripSuffix(".shp") + ".dbf"
    if (!new java.io.File(dbfPath).exists()) return (Nil, Nil, 0, 0, 0)
    val raf = new java.io.RandomAccessFile(dbfPath, "r")
    try {
      val head = new Array[Byte](32)
      raf.readFully(head)
      val hb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      val n = hb.getInt(4)
      val headerLen = hb.getShort(8) & 0xFFFF
      val recordLen = hb.getShort(10) & 0xFFFF
      val desc = new Array[Byte](headerLen - 32)
      raf.readFully(desc)
      val names = ArrayBuffer.empty[String]
      val lens = ArrayBuffer.empty[Int]
      var off = 0
      while (off + 32 <= desc.length && desc(off) != 0x0D) {
        names += new String(desc, off, 11, "ASCII").takeWhile(_ != 0).trim
        lens += (desc(off + 16) & 0xFF)
        off += 32
      }
      (names.toSeq, lens.toSeq, headerLen, recordLen, n)
    } finally raf.close()
  }

  /** Cut one file's record stream into partitions via the .shx index. */
  def partitionsOf(shpPath: String, maxRecs: Int): Seq[ShpPartition] = {
    val shxPath = shpPath.stripSuffix(".shp") + ".shx"
    val shx = ByteBuffer.wrap(Files.readAllBytes(Paths.get(shxPath)))
      .order(ByteOrder.BIG_ENDIAN)
    val n = (shx.capacity() - 100) / 8
    (0 until n by maxRecs).map { start =>
      val end = math.min(start + maxRecs, n)
      val byteStart = 2L * shx.getInt(100 + 8 * start)
      val lastOff = 2L * shx.getInt(100 + 8 * (end - 1))
      val lastLen = 2L * shx.getInt(100 + 8 * (end - 1) + 4)
      // +8 covers the record header (number + content length)
      ShpPartition(shpPath, start + 1, end + 1, byteStart, lastOff + 8 + lastLen)
    }
  }

  /** Parse the slice's records to WKB, keyed by record number. */
  def readRangeWkb(p: ShpPartition): Map[Int, Array[Byte]] = {
    val raf = new java.io.RandomAccessFile(p.shpPath, "r")
    try {
      val bytes = new Array[Byte]((p.byteEnd - p.byteStart).toInt)
      raf.seek(p.byteStart)
      raf.readFully(bytes)
      val buf = ByteBuffer.wrap(bytes)
      val out = Map.newBuilder[Int, Array[Byte]]
      var pos = 0
      while (pos < bytes.length) {
        buf.order(ByteOrder.BIG_ENDIAN)
        val recNo = buf.getInt(pos)
        val contentLen = buf.getInt(pos + 4) * 2
        buf.order(ByteOrder.LITTLE_ENDIAN)
        val shapeType = buf.getInt(pos + 8)
        Shapefile.parseShape(buf, pos + 8, shapeType)
          .foreach(g => out += recNo -> GeomCodec.toWkb(g))
        pos += 8 + contentLen
      }
      out.result()
    } finally raf.close()
  }

  /** Seek-read .dbf records [recStart, recEnd) (1-based shp numbering →
    * 0-based dbf index), returning only the requested fields. Deleted
    * rows (0x2A flag) keep their slot with null-equivalent empties so
    * numbering stays aligned with .shp.
    */
  def readDbfRange(shpPath: String, recStart: Int, recEnd: Int,
      fields: Seq[String]): Map[Int, Map[String, String]] = {
    val (names, lens, headerLen, recordLen, n) = dbfHeader(shpPath)
    if (names.isEmpty) return Map.empty
    val dbfPath = shpPath.stripSuffix(".shp") + ".dbf"
    val raf = new java.io.RandomAccessFile(dbfPath, "r")
    try {
      // clamp both ends to the .dbf's own record count: mismatched sidecars
      // (.shx slice past the .dbf tail) degrade to null attributes, not a
      // NegativeArraySizeException
      val from = math.max(0, math.min(recStart - 1, n))
      val until = math.max(from, math.min(recEnd - 1, n))
      if (until == from) return Map.empty
      val bytes = new Array[Byte]((until - from) * recordLen)
      raf.seek(headerLen.toLong + from.toLong * recordLen)
      raf.readFully(bytes)
      val offsets = names.indices.map(i => 1 + lens.take(i).sum)
      (from until until).map { idx =>
        val base = (idx - from) * recordLen
        val deleted = bytes(base) == 0x2A
        val row = names.indices.collect {
          case i if fields.contains(names(i)) =>
            names(i) -> (if (deleted) "" else
              new String(bytes, base + offsets(i), lens(i), "ISO-8859-1").trim)
        }.toMap
        (idx + 1) -> row
      }.toMap
    } finally raf.close()
  }
}
