package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic spec-conformant .npz fixtures — the ground truth the
  * [[NpzDataSource]] round-trips against (no numpy in this container; the
  * numpy-written twins in test resources pin real-world conformance, these
  * pin the writable path and feed the s5 gate query).
  */
object NpzFixtures {

  /** Serialize one npy v1 member: magic, u16 header length, Python-literal
    * dict padded to a 64-byte boundary (numpy/lib/format.py), raw LE data.
    */
  private def npy(descr: String, shape: Seq[Int], put: ByteBuffer => Unit,
                  byteLen: Int): Array[Byte] = {
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)" else shape.mkString("(", ", ", ")")
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val pad = 64 - ((10 + dict.length + 1) % 64) match {
      case 64 => 0
      case p  => p
    }
    val header = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + byteLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
      .put(1.toByte).put(0.toByte)
      .putShort(header.length.toShort)
      .put(header.getBytes("ISO-8859-1"))
    put(out)
    out.array()
  }

  private def npyDoubles(data: Array[Double]): Array[Byte] =
    npy("<f8", Seq(data.length), bb => data.foreach(bb.putDouble), data.length * 8)

  private def npyLongs(data: Array[Long]): Array[Byte] =
    npy("<i8", Seq(data.length), bb => data.foreach(bb.putLong), data.length * 8)

  private def npyStrings(data: Array[String], width: Int): Array[Byte] =
    npy(s"<U$width", Seq(data.length), bb => data.foreach { s =>
      val cps = s.codePoints().toArray
      require(cps.length <= width, s"'$s' exceeds <U$width")
      cps.foreach(bb.putInt)
      (cps.length until width).foreach(_ => bb.putInt(0))
    }, data.length * 4 * width)

  private def zip(members: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    members.foreach { case (name, bytes) =>
      zout.putNextEntry(new ZipEntry(s"$name.npy"))
      zout.write(bytes)
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }

  /** In-distribution archive: string ids, float energies, int counts. */
  def inDist: Array[Byte] = zip(
    "ids" -> npyStrings(Array("mp-101", "mp-2", "mp-33333", "mvc-7"), 8),
    "energies" -> npyDoubles(Array(1.5, -2.25, 0.75, -0.125)),
    "counts" -> npyLongs(Array(1L, 2L, 3L, 4L)))

  /** Out-of-distribution archive: no `counts` member (→ null column). */
  def ood: Array[Byte] = zip(
    "ids" -> npyStrings(Array("mp-8", "oqmd-77"), 8),
    "energies" -> npyDoubles(Array(0.5, -1.75)))

  /** Write both archives into a directory (stale *.npz removed — the s5
    * gate query globs the directory against a hard-pinned oracle).
    */
  def writeTo(dir: java.nio.file.Path): String = {
    java.nio.file.Files.createDirectories(dir)
    val old = java.nio.file.Files.list(dir)
    try old.filter(_.toString.endsWith(".npz"))
      .forEach(p => java.nio.file.Files.delete(p))
    finally old.close()
    java.nio.file.Files.write(dir.resolve("val_id.npz"), inDist)
    java.nio.file.Files.write(dir.resolve("val_ood.npz"), ood)
    dir.toString
  }
}
