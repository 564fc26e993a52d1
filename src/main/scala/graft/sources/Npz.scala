package graft.sources

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipInputStream

/** Real .npz/.npy parsing in plain JVM code — S5's file format
  * (reference: parity/data_processing_utils.py:9-72 reads id/energy
  * arrays with numpy.load).
  *
  * NPZ is a ZIP archive (stored or deflated — ZipInputStream handles
  * both) of NPY members. NPY (public format spec, numpy/lib/format.py):
  * magic \x93NUMPY, version bytes, little-endian header length (u16 for
  * v1, u32 for v2+), a Python-literal dict header with 'descr' /
  * 'fortran_order' / 'shape', then the raw array bytes.
  *
  * Supported dtypes cover the parity workload: <f8/<f4 (floats),
  * <i8/<i4 (ints), <U{n} (fixed-width UTF-32LE strings — numpy's id
  * arrays). Anything else is a hard error, not a silent skip.
  */
object Npz {

  sealed trait NpArray { def shape: Seq[Int] }
  case class NpDoubles(shape: Seq[Int], data: Array[Double]) extends NpArray
  case class NpLongs(shape: Seq[Int], data: Array[Long]) extends NpArray
  case class NpStrings(shape: Seq[Int], data: Array[String]) extends NpArray

  /** Parse a whole .npz archive: member name (minus .npy) → array.
    * `keep` gates which members are decompressed and parsed — the column
    * pruning hook for [[NpzDataSource]]: `getNextEntry` skips an unread
    * member's compressed bytes without inflating them.
    */
  def readNpz(bytes: Array[Byte],
              keep: String => Boolean = _ => true): Map[String, NpArray] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, NpArray]
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory && entry.getName.endsWith(".npy")) {
          val name = entry.getName.stripSuffix(".npy")
          if (keep(name)) out += name -> readNpy(zin.readAllBytes())
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Parse one .npy member. */
  def readNpy(b: Array[Byte]): NpArray = {
    require(b.length >= 10 && b(0) == 0x93.toByte &&
      new String(b, 1, 5, "US-ASCII") == "NUMPY", "not an NPY payload")
    val major = b(6) & 0xff
    require(major == 1 || b.length >= 12, "truncated NPY v2+ header length")
    val (hlen, hoff) =
      if (major == 1) ((b(8) & 0xff) | ((b(9) & 0xff) << 8), 10)
      else ((b(8) & 0xff) | ((b(9) & 0xff) << 8) | ((b(10) & 0xff) << 16) |
        ((b(11) & 0xff) << 24), 12)
    require(hlen >= 0 && hoff.toLong + hlen <= b.length,
      s"NPY header length $hlen overruns payload of ${b.length} bytes")
    val header = new String(b, hoff, hlen, "ISO-8859-1")
    def field(re: String, what: String): String =
      re.r.findFirstMatchIn(header)
        .getOrElse(throw new IllegalArgumentException(s"npy header missing $what"))
        .group(1)
    val descr = field("'descr'\\s*:\\s*'([^']+)'", "descr")
    require(field("'fortran_order'\\s*:\\s*(True|False)", "fortran_order") == "False",
      "fortran_order npy not supported")
    val shape = field("'shape'\\s*:\\s*\\(([^)]*)\\)", "shape")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    require(shape.forall(_ >= 0), s"negative dimension in shape (${shape.mkString(",")})")
    // long product: an Int product overflow (e.g. 65536×32768 dims) would
    // go negative and vacuously pass the payload-bounds check below
    val n = shape.foldLeft(1L)(_ * _.toLong) // empty shape () = scalar → 1
    require(n <= Int.MaxValue, s"shape (${shape.mkString(",")}) exceeds ${Int.MaxValue} elements")
    val elemSize = descr match {
      case "<f8" | "<i8"            => 8L
      case "<f4" | "<i4"            => 4L
      case u if u.startsWith("<U")  => 4L * u.drop(2).toInt
      case d => throw new IllegalArgumentException(s"unsupported npy dtype '$d'")
    }
    // a truncated member must be a clean hard error, not BufferUnderflow
    require(b.length - hoff - hlen >= n * elemSize,
      s"NPY payload holds ${b.length - hoff - hlen} bytes, " +
        s"need ${n * elemSize} for shape (${shape.mkString(",")}) $descr")
    val nI = n.toInt
    val bb = ByteBuffer.wrap(b, hoff + hlen, b.length - hoff - hlen)
      .order(ByteOrder.LITTLE_ENDIAN)
    descr match {
      case "<f8" => NpDoubles(shape, Array.fill(nI)(bb.getDouble))
      case "<f4" => NpDoubles(shape, Array.fill(nI)(bb.getFloat.toDouble))
      case "<i8" => NpLongs(shape, Array.fill(nI)(bb.getLong))
      case "<i4" => NpLongs(shape, Array.fill(nI)(bb.getInt.toLong))
      case u if u.startsWith("<U") =>
        // fixed-width UTF-32LE code points, NUL-padded
        val width = u.drop(2).toInt
        NpStrings(shape, Array.fill(nI) {
          val sb = new java.lang.StringBuilder(width)
          var i = 0
          var stop = false
          while (i < width) {
            val cp = bb.getInt
            if (cp == 0) stop = true
            else if (!stop) sb.appendCodePoint(cp)
            i += 1
          }
          sb.toString
        })
      case d => throw new IllegalArgumentException(s"unsupported npy dtype '$d'")
    }
  }
}
