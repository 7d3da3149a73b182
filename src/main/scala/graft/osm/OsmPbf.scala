package graft.osm

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream, RandomAccessFile}
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

/** OSM PBF (.osm.pbf) reader/writer — the binary sibling of the XML path
  * (reference: server-plugin/.../osm/OSMImporter.java parses XML only; PBF
  * is the format real planet-scale extracts ship in, so the 100 TB ingest
  * story needs it).
  *
  * Everything here implements the PUBLIC fileformat/osmformat specs
  * (wiki.openstreetmap.org/wiki/PBF_Format): a ~100-line protobuf wire
  * codec (varint/zigzag/packed/length-delimited — no protobuf library in
  * this build), zlib blobs via java.util.zip, DenseNodes delta coding.
  *
  * Scale shape: [[blobRefs]] is a driver-side INDEX scan that reads only
  * the 4-byte lengths and BlobHeaders and SKIPS every payload (I/O ≈ #blobs
  * × ~64 B), then [[parsePbf]] ships (path, offset, len) refs to executors
  * — one task per blob, each seeking directly to its slice. Unlike XML,
  * PBF blobs decode independently, so the parse itself is
  * embarrassingly parallel; only the tiny index pass is sequential.
  *
  * Coordinate fidelity: the spec's `lat = 1e-9·(offset + granularity·v)`
  * is evaluated as a DIVISION by 1e9 (mathematically identical), so
  * coordinates exactly representable at nano precision (every fixture
  * lattice point) round-trip bit-exactly — multiplying by the inexact
  * double 1e-9 would not.
  */
object OsmPbf {

  // ------------------------------------------------------------------ wire
  /** Minimal protobuf wire writer: varints, zigzag, packed and
    * length-delimited fields. Field keys are (fieldNo << 3) | wireType with
    * wireType 0 = varint, 2 = length-delimited.
    */
  final class Pb {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def key(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { key(field, 0); varint(zigzag(v)) }
    def bytes(field: Int, b: Array[Byte]): Unit = { key(field, 2); varint(b.length); out.write(b) }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int, m: Pb): Unit = bytes(field, m.toBytes)
    /** packed repeated varints (pre-zigzagged by the caller if sint) */
    def packed(field: Int, vs: Iterable[Long]): Unit =
      if (vs.nonEmpty) { val p = new Pb; vs.foreach(p.varint); bytes(field, p.toBytes) }
    def toBytes: Array[Byte] = out.toByteArray
  }
  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Streaming protobuf field reader over a byte slice. */
  final class PbIn(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do { b = buf(pos) & 0xff; pos += 1; v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    /** returns (fieldNo, wireType) */
    def key(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    def slice(): PbIn = { val n = varint().toInt; val s = new PbIn(buf, pos, pos + n); pos += n; s }
    def sliceBytes(): Array[Byte] = { val n = varint().toInt; val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => pos += 8
      // NOT `pos += varint()`: compound assignment reads pos BEFORE the
      // length varint advances it, silently dropping the prefix bytes
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
    def packedLongs(): Array[Long] = {
      val s = slice(); val b = ArrayBuffer.empty[Long]
      while (s.hasNext) b += s.varint()
      b.toArray
    }
  }

  // ------------------------------------------------------------ blob index
  /** One blob's location: decode needs only this (executor-shippable). */
  case class BlobRef(path: String, offset: Long, len: Int, blobType: String)

  /** Driver-side index pass: read [len][BlobHeader] pairs, skip payloads. */
  def blobRefs(path: String): Seq[BlobRef] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(new FileInputStream(path)))
    val refs = ArrayBuffer.empty[BlobRef]
    var offset = 0L
    try {
      while (true) {
        val hdrLen = try in.readInt() catch { case _: java.io.EOFException => return refs.toSeq }
        val hdr = new Array[Byte](hdrLen)
        in.readFully(hdr)
        var bType = ""; var dataSize = 0
        val p = new PbIn(hdr)
        while (p.hasNext) p.key() match {
          case (1, 2) => bType = new String(p.sliceBytes(), "UTF-8")
          case (3, 0) => dataSize = p.varint().toInt
          case (_, wt) => p.skip(wt)
        }
        val dataOffset = offset + 4 + hdrLen
        refs += BlobRef(path, dataOffset, dataSize, bType)
        in.skipBytes(dataSize)
        offset = dataOffset + dataSize
      }
      refs.toSeq
    } finally in.close()
  }

  /** Read + decompress one blob's payload (seek straight to the slice). */
  def blobPayload(ref: BlobRef): Array[Byte] = {
    val raf = new RandomAccessFile(ref.path, "r")
    try {
      raf.seek(ref.offset)
      val raw = new Array[Byte](ref.len)
      raf.readFully(raw)
      var rawBytes: Array[Byte] = null
      var zlib: Array[Byte] = null
      var rawSize = -1
      val p = new PbIn(raw)
      while (p.hasNext) p.key() match {
        case (1, 2) => rawBytes = p.sliceBytes()
        case (2, 0) => rawSize = p.varint().toInt
        case (3, 2) => zlib = p.sliceBytes()
        case (f, wt) =>
          if (wt == 2 && f >= 4) throw new IllegalArgumentException(
            s"blob at ${ref.offset} uses unsupported compression (field $f)")
          p.skip(wt)
      }
      if (rawBytes != null) rawBytes
      else {
        val inf = new Inflater()
        inf.setInput(zlib)
        val out = new Array[Byte](rawSize)
        var done = 0
        while (done < rawSize) {
          val k = inf.inflate(out, done, rawSize - done)
          // inflate returns 0 once finished()/needsInput() — a truncated or
          // corrupt stream must fail the task, not spin the executor forever
          if (k == 0) {
            inf.end()
            throw new java.io.IOException(s"truncated zlib blob at ${ref.offset}")
          }
          done += k
        }
        inf.end()
        out
      }
    } finally raf.close()
  }

  // --------------------------------------------------------------- decode
  /** Decode one OSMData blob into XML-staging-shaped rows (see
    * [[OsmImport.RawFile]] for the tuple layout).
    */
  def decodeData(ref: BlobRef): OsmImport.RawFile = {
    val block = new PbIn(blobPayload(ref))
    var strings: Array[String] = Array("")
    var granularity = 100L; var latOffset = 0L; var lonOffset = 0L; var dateGranularity = 1000L
    val groups = ArrayBuffer.empty[Array[Byte]]
    while (block.hasNext) block.key() match {
      case (1, 2) =>
        val s = block.slice(); val buf = ArrayBuffer.empty[String]
        while (s.hasNext) s.key() match {
          case (1, 2) => buf += new String(s.sliceBytes(), "UTF-8")
          case (_, wt) => s.skip(wt)
        }
        strings = buf.toArray
      case (2, 2) => groups += block.sliceBytes()
      case (17, 0) => granularity = block.varint()
      case (18, 0) => dateGranularity = block.varint()
      case (19, 0) => latOffset = block.varint()
      case (20, 0) => lonOffset = block.varint()
      case (_, wt) => block.skip(wt)
    }
    def coord(offset: Long, v: Long): Double = (offset + granularity * v) / 1e9
    def tsString(millis: Long): String =
      java.time.Instant.ofEpochMilli(millis).toString
    val nodes = ArrayBuffer.empty[(Long, Double, Double, Int, Long, Long, String, String)]
    val ways = ArrayBuffer.empty[(Long, Int, Long, String)]
    val wayNds = ArrayBuffer.empty[(Long, Int, Long)]
    val tags = ArrayBuffer.empty[(String, Long, String, String)]
    val relations = ArrayBuffer.empty[(Long, Int, Long, String)]
    val members = ArrayBuffer.empty[(Long, Int, String, Long, String)]

    /** Info submessage → (version, changeset, uid, userSid, tsMillis) */
    def readInfo(p: PbIn): (Int, Long, Long, Int, Long) = {
      var v = 0; var ts = 0L; var cs = 0L; var uid = 0L; var sid = 0
      while (p.hasNext) p.key() match {
        case (1, 0) => v = p.varint().toInt
        case (2, 0) => ts = p.varint() * dateGranularity
        case (3, 0) => cs = p.varint()
        case (4, 0) => uid = p.varint()
        case (5, 0) => sid = p.varint().toInt
        case (_, wt) => p.skip(wt)
      }
      (v, cs, uid, sid, ts)
    }

    groups.foreach { gb =>
      val g = new PbIn(gb)
      while (g.hasNext) g.key() match {
        case (1, 2) =>                                   // plain Node
          val n = g.slice()
          var id = 0L; var lat = 0L; var lon = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          var info = (0, 0L, 0L, 0, -1L)
          while (n.hasNext) n.key() match {
            case (1, 0) => id = unzigzag(n.varint())
            case (2, 2) => keys = n.packedLongs()
            case (3, 2) => vals = n.packedLongs()
            case (4, 2) => info = readInfo(n.slice())
            case (8, 0) => lat = unzigzag(n.varint())
            case (9, 0) => lon = unzigzag(n.varint())
            case (_, wt) => n.skip(wt)
          }
          nodes += ((id, coord(latOffset, lat), coord(lonOffset, lon), info._1,
            info._2, info._3, strings(info._4),
            if (info._5 >= 0) tsString(info._5) else ""))
          keys.indices.foreach(i =>
            tags += (("node", id, strings(keys(i).toInt), strings(vals(i).toInt))))
        case (2, 2) =>                                   // DenseNodes
          val d = g.slice()
          var ids = Array.emptyLongArray; var lats = Array.emptyLongArray
          var lons = Array.emptyLongArray; var kv = Array.emptyLongArray
          var dvVersion = Array.emptyLongArray; var dvTs = Array.emptyLongArray
          var dvCs = Array.emptyLongArray; var dvUid = Array.emptyLongArray
          var dvSid = Array.emptyLongArray
          while (d.hasNext) d.key() match {
            case (1, 2) => ids = d.packedLongs().map(unzigzag)
            case (5, 2) =>
              val di = d.slice()
              while (di.hasNext) di.key() match {
                case (1, 2) => dvVersion = di.packedLongs()
                case (2, 2) => dvTs = di.packedLongs().map(unzigzag)
                case (3, 2) => dvCs = di.packedLongs().map(unzigzag)
                case (4, 2) => dvUid = di.packedLongs().map(unzigzag)
                case (5, 2) => dvSid = di.packedLongs().map(unzigzag)
                case (_, wt) => di.skip(wt)
              }
            case (8, 2) => lats = d.packedLongs().map(unzigzag)
            case (9, 2) => lons = d.packedLongs().map(unzigzag)
            case (10, 2) => kv = d.packedLongs()
            case (_, wt) => d.skip(wt)
          }
          var id = 0L; var lat = 0L; var lon = 0L; var ts = 0L; var cs = 0L
          var uid = 0L; var sid = 0L; var kvPos = 0
          ids.indices.foreach { i =>
            id += ids(i); lat += lats(i); lon += lons(i)
            if (dvTs.nonEmpty) ts += dvTs(i)
            if (dvCs.nonEmpty) cs += dvCs(i)
            if (dvUid.nonEmpty) uid += dvUid(i)
            if (dvSid.nonEmpty) sid += dvSid(i)
            val version = if (dvVersion.nonEmpty) dvVersion(i).toInt else 0
            nodes += ((id, coord(latOffset, lat), coord(lonOffset, lon), version,
              cs, uid, if (dvSid.nonEmpty) strings(sid.toInt) else "",
              if (dvTs.nonEmpty) tsString(ts * dateGranularity) else ""))
            while (kvPos < kv.length && kv(kvPos) != 0L) {
              tags += (("node", id, strings(kv(kvPos).toInt), strings(kv(kvPos + 1).toInt)))
              kvPos += 2
            }
            if (kvPos < kv.length) kvPos += 1              // the 0 terminator
          }
        case (3, 2) =>                                   // Way
          val wmsg = g.slice()
          var id = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          var refs = Array.emptyLongArray
          var info = (0, 0L, 0L, 0, -1L)
          while (wmsg.hasNext) wmsg.key() match {
            case (1, 0) => id = wmsg.varint()
            case (2, 2) => keys = wmsg.packedLongs()
            case (3, 2) => vals = wmsg.packedLongs()
            case (4, 2) => info = readInfo(wmsg.slice())
            case (8, 2) => refs = wmsg.packedLongs().map(unzigzag)
            case (_, wt) => wmsg.skip(wt)
          }
          ways += ((id, info._1, info._2, if (info._5 >= 0) tsString(info._5) else ""))
          var ref = 0L
          refs.indices.foreach { i => ref += refs(i); wayNds += ((id, i, ref)) }
          keys.indices.foreach(i =>
            tags += (("way", id, strings(keys(i).toInt), strings(vals(i).toInt))))
        case (4, 2) =>                                   // Relation
          val r = g.slice()
          var id = 0L
          var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
          var roles = Array.emptyLongArray; var memids = Array.emptyLongArray
          var types = Array.emptyLongArray
          var info = (0, 0L, 0L, 0, -1L)
          while (r.hasNext) r.key() match {
            case (1, 0) => id = r.varint()
            case (2, 2) => keys = r.packedLongs()
            case (3, 2) => vals = r.packedLongs()
            case (4, 2) => info = readInfo(r.slice())
            case (8, 2) => roles = r.packedLongs()
            case (9, 2) => memids = r.packedLongs().map(unzigzag)
            case (10, 2) => types = r.packedLongs()
            case (_, wt) => r.skip(wt)
          }
          relations += ((id, info._1, info._2, if (info._5 >= 0) tsString(info._5) else ""))
          var mem = 0L
          val typeName = Array("node", "way", "relation")
          memids.indices.foreach { i =>
            mem += memids(i)
            members += ((id, i, typeName(types(i).toInt), mem, strings(roles(i).toInt)))
          }
          keys.indices.foreach(i =>
            tags += (("relation", id, strings(keys(i).toInt), strings(vals(i).toInt))))
        case (_, wt) => g.skip(wt)
      }
    }
    OsmImport.RawFile(nodes.toSeq, ways.toSeq, wayNds.toSeq, tags.toSeq,
      relations.toSeq, members.toSeq)
  }

  /** Validate the OSMHeader blob: we must understand every required
    * feature, exactly as conformant readers are obliged to.
    */
  def checkHeader(ref: BlobRef): Unit = {
    val supported = Set("OsmSchema-V0.6", "DenseNodes")
    val p = new PbIn(blobPayload(ref))
    while (p.hasNext) p.key() match {
      case (4, 2) =>
        val f = new String(p.sliceBytes(), "UTF-8")
        require(supported(f), s"unsupported required PBF feature: $f")
      case (_, wt) => p.skip(wt)
    }
  }

  /** Parse a .osm.pbf into the same [[OsmImport.Staging]] the XML paths
    * produce: driver index scan, then ONE EXECUTOR TASK PER DATA BLOB.
    * Blobs partition the entity stream disjointly, so no dedup is needed
    * (unlike overlapping .osm area shards).
    */
  def parsePbf(spark: SparkSession, path: String): OsmImport.Staging = {
    val refs = blobRefs(path)
    refs.filter(_.blobType == "OSMHeader").foreach(checkHeader)
    val data = refs.filter(_.blobType == "OSMData")
    require(data.nonEmpty, s"no OSMData blobs in $path")
    import spark.implicits._
    val raw = spark.sparkContext.parallelize(data, data.length)
      .map(decodeData)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    OsmImport.Staging(
      raw.flatMap(_.nodes).toDF("node_id", "lat", "lon", "version", "changeset", "uid", "user", "ts"),
      raw.flatMap(_.ways).toDF("way_id", "version", "changeset", "ts"),
      raw.flatMap(_.wayNds).toDF("way_id", "seq", "node_id"),
      raw.flatMap(_.tags).toDF("elem_type", "elem_id", "k", "v"),
      raw.flatMap(_.relations).toDF("relation_id", "version", "changeset", "ts"),
      raw.flatMap(_.members).toDF("relation_id", "seq", "member_type", "member_ref", "role"))
  }

  // --------------------------------------------------------------- encode
  /** Entities for the writer (version goes into Info/DenseInfo; tags into
    * the string table).
    */
  case class PbfNode(id: Long, lon: Double, lat: Double, version: Int = 1,
      tags: Seq[(String, String)] = Nil)
  case class PbfWay(id: Long, refs: Seq[Long], version: Int = 1,
      tags: Seq[(String, String)] = Nil)

  /** Write a .osm.pbf: OSMHeader blob + zlib OSMData blobs of `batch`
    * entities each (DenseNodes + Ways, delta-coded per spec). Small
    * batches force multiple blobs — the unit tests use that to exercise
    * the parallel decode path and cross-blob delta restarts.
    */
  def writePbf(path: String, nodes: Seq[PbfNode], ways: Seq[PbfWay],
      batch: Int = 8000): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(new FileOutputStream(path)))
    try {
      writeBlob(out, "OSMHeader", {
        val h = new Pb
        h.string(4, "OsmSchema-V0.6")
        h.string(4, "DenseNodes")
        h.string(16, "graft-osmpbf")
        h.toBytes
      }, compress = false)
      nodes.grouped(batch).foreach { ns =>
        writeBlob(out, "OSMData", primitiveBlock(denseGroup(ns, _: StringPool), Nil), compress = true)
      }
      ways.grouped(batch).foreach { ws =>
        writeBlob(out, "OSMData", primitiveBlock(_ => None, ws), compress = true)
      }
    } finally out.close()
  }

  /** Interns strings into the block's table (index 0 reserved empty). */
  final class StringPool {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def apply(s: String): Long = idx.getOrElseUpdate(s, idx.size).toLong
    def all: Seq[String] = idx.keys.toSeq
  }

  private def denseGroup(ns: Seq[PbfNode], pool: StringPool): Option[Pb] = {
    if (ns.isEmpty) return None
    val d = new Pb
    d.packed(1, deltas(ns.map(_.id)).map(zigzag))
    val di = new Pb
    di.packed(1, ns.map(_.version.toLong))
    d.msg(5, di)
    d.packed(8, deltas(ns.map(n => math.round(n.lat * 1e9 / 100))).map(zigzag))
    d.packed(9, deltas(ns.map(n => math.round(n.lon * 1e9 / 100))).map(zigzag))
    if (ns.exists(_.tags.nonEmpty))
      d.packed(10, ns.flatMap(n => n.tags.flatMap(t => Seq(pool(t._1), pool(t._2))) :+ 0L))
    val g = new Pb
    g.msg(2, d)
    Some(g)
  }

  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.headOption.toSeq ++ vs.sliding(2).collect { case Seq(a, b) => b - a }

  /** Assemble a PrimitiveBlock: string table first (it indexes everything
    * else), granularity 100, offsets 0 — the spec defaults, written
    * explicitly.
    */
  private def primitiveBlock(denseOf: StringPool => Option[Pb], ways: Seq[PbfWay]): Array[Byte] = {
    val pool = new StringPool
    val dense = denseOf(pool)
    val wayGroup = if (ways.isEmpty) None else {
      val g = new Pb
      ways.foreach { w =>
        val wm = new Pb
        wm.int(1, w.id)
        if (w.tags.nonEmpty) {
          wm.packed(2, w.tags.map(t => pool(t._1)))
          wm.packed(3, w.tags.map(t => pool(t._2)))
        }
        val info = new Pb
        info.int(1, w.version.toLong)
        wm.msg(4, info)
        wm.packed(8, deltas(w.refs).map(zigzag))
        g.msg(3, wm)
      }
      Some(g)
    }
    val block = new Pb
    val st = new Pb
    pool.all.foreach(s => st.bytes(1, s.getBytes("UTF-8")))
    block.msg(1, st)
    dense.foreach(block.msg(2, _))
    wayGroup.foreach(block.msg(2, _))
    block.int(17, 100L)
    block.toBytes
  }

  private def writeBlob(out: DataOutputStream, blobType: String,
      payload: Array[Byte], compress: Boolean): Unit = {
    val blob = new Pb
    if (compress) {
      val def0 = new Deflater()
      def0.setInput(payload); def0.finish()
      val acc = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!def0.finished()) acc.write(buf, 0, def0.deflate(buf))
      def0.end()
      blob.int(2, payload.length.toLong)
      blob.bytes(3, acc.toByteArray)
    } else blob.bytes(1, payload)
    val blobBytes = blob.toBytes
    val hdr = new Pb
    hdr.string(1, blobType)
    hdr.int(3, blobBytes.length.toLong)
    val hdrBytes = hdr.toBytes
    out.writeInt(hdrBytes.length)
    out.write(hdrBytes)
    out.write(blobBytes)
  }
}
