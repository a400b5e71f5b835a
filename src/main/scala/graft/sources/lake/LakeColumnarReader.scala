package graft.sources.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}

/** COLUMNAR read path of the `graft-lake` connector (VERDICT r16 #3):
  * one data file served as `ColumnarBatch`es through Spark's OWN
  * vectorized parquet reader instead of object-per-row `Group` assembly
  * — the difference between forfeiting and keeping the
  * vectorized/whole-stage-codegen scan machinery on every full scan at
  * 100 TB. Delete forms (deletion vector, position sidecar, equality
  * deletes under the strictly-older sequence rule) apply as a per-batch
  * ROW-ID MAP over wrapped vectors — the Iceberg approach: a batch with
  * no surviving kill is passed through ZERO-COPY (vectors handed to
  * Spark in output order, nothing rewritten); a batch with kills
  * COMPACTS each physical vector — one sequential copy of survivors into
  * fresh on-heap vectors, keeping downstream codegen on the specialized
  * fast path ([[RowIdMappedVector]] remains the fallback for exotic
  * types). Constant columns (Hive partition values,
  * `_file`, initial defaults for fields postdating a file) ride Spark's
  * `initBatch` partition-column mechanism.
  *
  * Scope: EVERY world. The schema-ID mapped worlds' per-file
  * indirections are expressed in the partition's column specs — a
  * renamed column requests its write-time PHYSICAL name at the current
  * TARGET type, and Spark's vectorized updaters perform the widen
  * (int→bigint, float→double, and the exact power-of-ten decimal
  * rescale) while decoding; absent fields serve their initial default
  * as constants. One decode path for plain and mapped worlds alike.
  */
private[lake] class LakeColumnarPartitionReader(
    p: LakeInputPartition,
    eqKeys: Array[Long], eqSeqs: Array[Long])
    extends PartitionReader[ColumnarBatch] {

  // equality-delete keys that apply to THIS file (strictly-newer rule)
  private val eqLive: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < eqKeys.length) {
      if (eqSeqs(i) > p.seq) s.add(eqKeys(i))
      i += 1
    }
    s
  }

  // physical columns with their requested Catalyst types (plain worlds:
  // the declared type IS the file type — no widening on this path)
  private val physSpecs: Array[(String, DataType)] = {
    val fromCols = p.cols.collect { case PhysCol(n, t) => (n, t) }
    if (p.eqKeyPhys.nonEmpty && !eqLive.isEmpty &&
        !fromCols.exists(_._1 == p.eqKeyPhys))
      fromCols :+ ((p.eqKeyPhys, LongType: DataType))
    else fromCols
  }

  // constant columns (partition values, _file) in p.cols order
  private val constSpecs: Array[(Int, ConstCol)] =
    p.cols.zipWithIndex.collect { case (c: ConstCol, i) => (i, c) }
  private val constSchema = StructType(constSpecs.zipWithIndex.map {
    case ((_, c), j) => StructField(s"c$j", c.target, nullable = true) })
  private val constRow: InternalRow = new GenericInternalRow(
    constSpecs.map { case (_, c) =>
      if (c.literal == null) null
      else LakeLiterals.cast(c.literal, c.target) }.toArray[Any])

  // Production init path (split + task context + our OWN conf): the
  // test-oriented initialize(path, columns) builds a FRESH Hadoop
  // Configuration per call, and parsing core-default.xml off the
  // classpath per FILE was measured as the dominant scan cost at 100×
  // (jstack: URLClassPath/Inflater/wstx frames dominating executor
  // threads — BASELINE round-17). The shared base parses once per JVM.
  // An EMPTY requested schema is legal (COUNT(*)): batches carry row
  // counts straight from row-group metadata with zero column IO.
  private val reader = {
    val conf = LakeHadoopConf.fresh()
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      StructType(physSpecs.map { case (n, t) =>
        StructField(n, t, nullable = true) }).json)
    // fixture dates are all post-Gregorian; CORRECTED = no rebase
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    val split = new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(p.path), 0,
      java.nio.file.Files.size(java.nio.file.Paths.get(p.path)),
      Array.empty[String])
    r.initialize(split,
      new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf, new org.apache.hadoop.mapreduce.TaskAttemptID()))
    r.initBatch(constSchema, constRow)
    r.enableReturningBatches()
    r
  }

  // batch column index for each output column: physical columns come
  // first in physSpecs order, then the constants in constSpecs order
  private val physIdx: Map[String, Int] =
    physSpecs.map(_._1).zipWithIndex.toMap
  private val outIdx: Array[Int] = {
    val constPos = constSpecs.map(_._1).zipWithIndex.toMap
    p.cols.zipWithIndex.map {
      case (PhysCol(n, _), _) => physIdx(n)
      case (_: ConstCol, i) => physSpecs.length + constPos(i)
    }
  }
  private val eqIdx: Int =
    if (eqLive.isEmpty || p.eqKeyPhys.isEmpty) -1
    else physIdx.getOrElse(p.eqKeyPhys, -1)

  private val hasDeletes =
    p.dvWords != null || p.posDeletes != null || eqIdx >= 0

  private var rowsSeen: Long = 0L // file-ordinal position of the next batch
  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val batch = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      val n = batch.numRows()
      val base = rowsSeen
      rowsSeen += n
      if (!hasDeletes) {
        current = reorder(batch, null, n)
        return true
      }
      // survival map for this batch
      val map = new Array[Int](n)
      var live = 0
      var i = 0
      while (i < n) {
        if (survives(base + i, batch, i)) { map(live) = i; live += 1 }
        i += 1
      }
      if (live == n) { current = reorder(batch, null, n); return true }
      if (live > 0) { current = reorder(batch, map, live); return true }
      // fully-deleted batch: keep scanning
    }
    false
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = {
    owned.foreach(_.close())
    owned = Array.empty
    reader.close()
  }

  private def survives(pos: Long, batch: ColumnarBatch, row: Int): Boolean = {
    if (p.dvWords != null) {
      val w = (pos >> 6).toInt
      if (w < p.dvWords.length && ((p.dvWords(w) >>> (pos & 63)) & 1L) == 1L)
        return false
    }
    if (p.posDeletes != null &&
        java.util.Arrays.binarySearch(p.posDeletes, pos) >= 0)
      return false
    if (eqIdx >= 0 && eqLive.contains(batch.column(eqIdx).getLong(row)))
      return false
    true
  }

  // compacted vectors of the PREVIOUS batch, closed before the next one
  // (the reader owns this memory; pass-through batches are owned by the
  // underlying vectorized reader and must not be closed here)
  private var owned: Array[ColumnVector] = Array.empty

  /** Output batch in `p.cols` order: pass vectors through untouched when
    * `map` is null (no kill in this batch — zero copy). A batch WITH
    * kills COMPACTS each physical vector: surviving values copy once,
    * sequentially, into a fresh OnHeapColumnVector, so downstream
    * whole-stage codegen keeps the specialized vector fast path — a
    * wrapped row-id indirection was measured at ROW-reader speed on
    * dense-DV scans (every batch carrying a few kills re-virtualizes
    * every access; see BASELINE round-17), while compaction costs one
    * linear pass over survivors. Constants are position-independent
    * either way.
    */
  private def reorder(
      batch: ColumnarBatch, map: Array[Int], rows: Int): ColumnarBatch = {
    owned.foreach(_.close())
    val fresh = scala.collection.mutable.ArrayBuffer.empty[ColumnVector]
    val out = new Array[ColumnVector](p.cols.length)
    var i = 0
    while (i < p.cols.length) {
      val v = batch.column(outIdx(i))
      out(i) =
        if (map == null || outIdx(i) >= physSpecs.length) v
        else { val c = compact(v, map, rows); fresh += c; c }
      i += 1
    }
    owned = fresh.toArray
    val b = new ColumnarBatch(out)
    b.setNumRows(rows)
    b
  }

  /** One surviving-rows copy of `v` (fallback: the row-id wrapper for
    * types outside the lake write surface).
    */
  private def compact(
      v: ColumnVector, map: Array[Int], rows: Int): ColumnVector = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val t = v.dataType()
    def fill(put: (OnHeapColumnVector, Int, Int) => Unit): ColumnVector = {
      val c = new OnHeapColumnVector(rows, t)
      var i = 0
      while (i < rows) {
        val src = map(i)
        if (v.isNullAt(src)) c.putNull(i) else put(c, i, src)
        i += 1
      }
      c
    }
    t match {
      case LongType => fill((c, i, s) => c.putLong(i, v.getLong(s)))
      case IntegerType | DateType => fill((c, i, s) => c.putInt(i, v.getInt(s)))
      case DoubleType => fill((c, i, s) => c.putDouble(i, v.getDouble(s)))
      case FloatType => fill((c, i, s) => c.putFloat(i, v.getFloat(s)))
      case BooleanType => fill((c, i, s) => c.putBoolean(i, v.getBoolean(s)))
      case StringType | BinaryType => fill { (c, i, s) =>
        val b = v.getBinary(s)
        c.putByteArray(i, b, 0, b.length)
        ()
      }
      case _ => new RowIdMappedVector(v, map)
    }
  }
}

/** One parsed Hadoop Configuration per JVM. `new Configuration()` parses
  * core-default.xml off the classpath (classloader resource scan + zip
  * inflate + XML parse) EVERY time — done per file across a 100 TB scan
  * that is the scan bottleneck, not the IO. Per-reader copies use the
  * copy constructor, which clones the already-parsed property map.
  */
private[lake] object LakeHadoopConf {
  lazy val base: org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    // keys the vectorized reader's schema converter consults
    c.setBoolean("spark.sql.parquet.binaryAsString", false)
    c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    c.setBoolean("spark.sql.caseSensitive", false)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    // the vectorized reader resolves its ReadSupport through this key,
    // exactly as Spark's own ParquetPartitionReaderFactory sets it
    c.set("parquet.read.support.class",
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    c.get("io.file.buffer.size") // force the XML parse NOW, once
    c
  }
  def fresh(): org.apache.hadoop.conf.Configuration =
    new org.apache.hadoop.conf.Configuration(base)
}

/** Typed-literal casts shared by the row and columnar readers. */
private[lake] object LakeLiterals {
  def cast(v: String, t: DataType): AnyRef = t match {
    case LongType => java.lang.Long.valueOf(v.toLong)
    case IntegerType => java.lang.Integer.valueOf(v.toInt)
    case DoubleType => java.lang.Double.valueOf(v.toDouble)
    case FloatType => java.lang.Float.valueOf(v.toFloat)
    case BooleanType => java.lang.Boolean.valueOf(v.toBoolean)
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
    case other => sys.error(s"graft-lake: unsupported default type $other")
  }
}

/** A ColumnVector view that serves row `i` from `delegate(map(i))` —
  * how row-level deletes apply to a columnar batch without copying a
  * single cell. Only the scalar accessors the lake schema can carry are
  * mapped; nested accessors fail loudly. `hasNull`/`numNulls` report the
  * DELEGATE's counts — a safe over-approximation (consumers use them
  * only to skip the null fast path).
  */
private[lake] class RowIdMappedVector(
    delegate: ColumnVector, map: Array[Int])
    extends ColumnVector(delegate.dataType()) {
  override def close(): Unit = () // underlying batch owns the buffers
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls(): Int = delegate.numNulls()
  override def isNullAt(i: Int): Boolean = delegate.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = delegate.getBoolean(map(i))
  override def getByte(i: Int): Byte = delegate.getByte(map(i))
  override def getShort(i: Int): Short = delegate.getShort(map(i))
  override def getInt(i: Int): Int = delegate.getInt(map(i))
  override def getLong(i: Int): Long = delegate.getLong(map(i))
  override def getFloat(i: Int): Float = delegate.getFloat(map(i))
  override def getDouble(i: Int): Double = delegate.getDouble(map(i))
  override def getArray(i: Int): ColumnarArray =
    throw new UnsupportedOperationException("nested arrays in lake scan")
  override def getMap(i: Int): ColumnarMap =
    throw new UnsupportedOperationException("nested maps in lake scan")
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    delegate.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    delegate.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = delegate.getBinary(map(i))
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException("nested structs in lake scan")
}
