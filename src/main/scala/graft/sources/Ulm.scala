package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** ASE ULM ("- of Ulm") container reader/writer + ASE-Trajectory adapter —
  * the real parser behind the S6 trajectory source
  * (parity/data_processing_utils.py:75-141 reads `ase.io.Trajectory` files
  * for per-frame energies and anomaly screening).
  *
  * Container layout per the public `ase.io.ulm` module documentation:
  * {{{
  *   0:  b"- of Ulm"             8-byte magic
  *   8:  ascii tag, padded       16 bytes ("ASE-Trajectory" for .traj)
  *   24: little-endian int64 ×3  version, nitems, pos0
  *   pos0: nitems × int64        absolute offset of each item
  * }}}
  * Each item is an int64 length n followed by n bytes of UTF-8 JSON. Large
  * arrays live out-of-band as raw little-endian buffers, referenced from
  * the JSON as `{"ndarray": [[shape...], "<dtype-name>", <abs offset>]}`.
  * Trajectory items store per-file-constant arrays (numbers, pbc, tags)
  * only in the first frame; later frames inherit them.
  *
  * No ASE exists in this container, so the reader is validated by
  * round-trip against [[Ulm.write]]-produced, spec-conformant fixtures
  * (UlmSpec); the key mapping ("atoms"/"calculator" nesting, with
  * item-level fallbacks) is centralized in [[UlmTraj]] should a real
  * ASE-written file deviate.
  */
object Ulm {
  private val Magic = "- of Ulm".getBytes("US-ASCII")
  private val mapper = new ObjectMapper()

  sealed trait Nd { def shape: Seq[Int] }
  case class NdDoubles(shape: Seq[Int], data: Array[Double]) extends Nd
  case class NdLongs(shape: Seq[Int], data: Array[Long]) extends Nd
  case class NdInts(shape: Seq[Int], data: Array[Int]) extends Nd
  case class NdBools(shape: Seq[Int], data: Array[Boolean]) extends Nd

  /** Parse the container: (tag, version, one JsonNode per item). */
  def readItems(b: Array[Byte]): (String, Long, Seq[JsonNode]) = {
    require(b.length >= 48, s"ULM file of ${b.length} bytes has no header")
    require(Magic.indices.forall(i => b(i) == Magic(i)), "not a ULM file (bad magic)")
    val tag = new String(b, 8, 16, "US-ASCII").trim
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val version = bb.getLong(24)
    val nitems = bb.getLong(32)
    val pos0 = bb.getLong(40)
    require(nitems >= 0 && nitems < Int.MaxValue, s"bad nitems $nitems")
    require(pos0 >= 48 && pos0 + 8 * nitems <= b.length,
      s"offsets array at $pos0 (+${8 * nitems}) overruns ${b.length} bytes")
    val items = (0L until nitems).map { i =>
      val off = bb.getLong((pos0 + 8 * i).toInt)
      require(off >= 48 && off + 8 <= b.length, s"item $i offset $off out of range")
      val n = bb.getLong(off.toInt)
      require(n >= 0 && off + 8 + n <= b.length,
        s"item $i JSON of $n bytes at $off overruns ${b.length} bytes")
      mapper.readTree(new String(b, off.toInt + 8, n.toInt, "UTF-8"))
    }
    (tag, version, items)
  }

  /** True iff this JSON node is an out-of-band ndarray reference. */
  def isNdRef(n: JsonNode): Boolean =
    n != null && n.isObject && n.has("ndarray") && n.get("ndarray").isArray

  /** Decode an ndarray reference against the file bytes. */
  def ndarray(b: Array[Byte], ref: JsonNode): Nd = {
    require(isNdRef(ref), s"not an ndarray reference: $ref")
    val spec = ref.get("ndarray")
    val shape = (0 until spec.get(0).size()).map(spec.get(0).get(_).asInt())
    val dtype = spec.get(1).asText()
    val off = spec.get(2).asLong()
    val n = shape.map(_.toLong).product // empty shape () = scalar → 1
    val size = dtype match {
      case "float64" | "int64" => 8L
      case "int32"             => 4L
      case "bool" | "int8" | "uint8" => 1L
      case d => throw new IllegalArgumentException(s"unsupported ULM dtype '$d'")
    }
    require(off >= 48 && off + n * size <= b.length,
      s"ndarray $dtype shape (${shape.mkString(",")}) at $off overruns ${b.length} bytes")
    val bb = ByteBuffer.wrap(b, off.toInt, (n * size).toInt).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "float64" =>
        val a = new Array[Double](n.toInt); bb.asDoubleBuffer().get(a); NdDoubles(shape, a)
      case "int64" =>
        val a = new Array[Long](n.toInt); bb.asLongBuffer().get(a); NdLongs(shape, a)
      case "int32" =>
        val a = new Array[Int](n.toInt); bb.asIntBuffer().get(a); NdInts(shape, a)
      case _ =>
        NdBools(shape, (0 until n.toInt).map(i => b(off.toInt + i) != 0).toArray)
    }
  }

  /** Spec-conformant ULM writer (also the round-trip validation fixture
    * source). `items` are JSON trees in which [[ArrayValue]] leaves are
    * written out-of-band and replaced by ndarray references.
    */
  sealed trait Value
  case class VNum(v: Double) extends Value
  case class VInt(v: Long) extends Value
  case class VStr(v: String) extends Value
  case class VBool(v: Boolean) extends Value
  case class VObj(fields: Seq[(String, Value)]) extends Value
  case class VArrD(shape: Seq[Int], data: Array[Double]) extends Value
  case class VArrL(shape: Seq[Int], data: Array[Long]) extends Value
  case class VArrB(shape: Seq[Int], data: Array[Boolean]) extends Value

  def write(tag: String, items: Seq[VObj]): Array[Byte] = {
    require(tag.length <= 16, s"tag '$tag' exceeds 16 bytes")
    val out = new java.io.ByteArrayOutputStream()
    def pad8(): Unit = while (out.size() % 8 != 0) out.write(0)
    out.write(Magic)
    out.write(tag.padTo(16, ' ').getBytes("US-ASCII"))
    val header = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(1L).putLong(items.size.toLong).putLong(0L) // pos0 patched below
    out.write(header.array())
    def writeLong(v: Long): Unit = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(v); out.write(bb.array())
    }
    // out-of-band arrays first per item, then the length-prefixed JSON
    def toJson(v: Value): JsonNode = v match {
      case VNum(d)  => mapper.getNodeFactory.numberNode(d)
      case VInt(l)  => mapper.getNodeFactory.numberNode(l)
      case VStr(s)  => mapper.getNodeFactory.textNode(s)
      case VBool(x) => mapper.getNodeFactory.booleanNode(x)
      case VObj(fs) =>
        val o = mapper.createObjectNode()
        fs.foreach { case (k, x) => o.set[ObjectNode](k, toJson(x)) }
        o
      case VArrD(shape, data) =>
        pad8(); val off = out.size()
        val bb = ByteBuffer.allocate(8 * data.length).order(ByteOrder.LITTLE_ENDIAN)
        data.foreach(bb.putDouble); out.write(bb.array())
        ndRef(shape, "float64", off)
      case VArrL(shape, data) =>
        pad8(); val off = out.size()
        val bb = ByteBuffer.allocate(8 * data.length).order(ByteOrder.LITTLE_ENDIAN)
        data.foreach(bb.putLong); out.write(bb.array())
        ndRef(shape, "int64", off)
      case VArrB(shape, data) =>
        pad8(); val off = out.size()
        data.foreach(x => out.write(if (x) 1 else 0))
        ndRef(shape, "bool", off)
    }
    val offsets = items.map { it =>
      val json = toJson(it)
      pad8(); val off = out.size()
      val bytes = mapper.writeValueAsString(json).getBytes("UTF-8")
      writeLong(bytes.length.toLong)
      out.write(bytes)
      off.toLong
    }
    pad8()
    val pos0 = out.size().toLong
    offsets.foreach(writeLong)
    val b = out.toByteArray
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putLong(40, pos0)
    b
  }

  private def ndRef(shape: Seq[Int], dtype: String, off: Int): JsonNode = {
    val o = mapper.createObjectNode()
    val arr = mapper.createArrayNode()
    val sh = mapper.createArrayNode()
    shape.foreach(sh.add)
    arr.add(sh); arr.add(dtype); arr.add(off.toLong)
    o.set[ObjectNode]("ndarray", arr)
    o
  }
}
