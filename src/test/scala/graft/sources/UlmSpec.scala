package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import Ulm._

/** S6 real trajectory parser: ULM container round-trip + ASE-Trajectory
  * frame semantics (inheritance, calculator energies, anomaly screen).
  * No ASE exists in this container, so fixtures are written by [[Ulm.write]]
  * against the public ULM spec and round-trip-validated.
  */
class UlmSpec extends SparkTestBase {
  import spark.implicits._

  // Cu(4)-slab + CO-adsorbate fixtures (tags 1 = surface, 2 = adsorbate)
  // shared with the s6 gate query
  private def stableTraj: Array[Byte] = UlmFixtures.stable
  private def desorbedTraj: Array[Byte] = UlmFixtures.desorbed

  test("ULM container round-trips every dtype") {
    val bytes = Ulm.write("graft-test", Seq(VObj(Seq(
      "d" -> VArrD(Seq(2, 2), Array(1.5, -2.5, 3.0, 0.0)),
      "l" -> VArrL(Seq(3), Array(7L, -8L, 9L)),
      "b" -> VArrB(Seq(2), Array(true, false)),
      "s" -> VStr("hello"), "n" -> VNum(2.25), "i" -> VInt(42L)))))
    val (tag, version, items) = Ulm.readItems(bytes)
    assert(tag == "graft-test" && version == 1L && items.size == 1)
    val it = items.head
    Ulm.ndarray(bytes, it.get("d")) match {
      case NdDoubles(Seq(2, 2), d) => assert(d.toSeq == Seq(1.5, -2.5, 3.0, 0.0))
      case other => fail(s"$other")
    }
    Ulm.ndarray(bytes, it.get("l")) match {
      case NdLongs(Seq(3), d) => assert(d.toSeq == Seq(7L, -8L, 9L))
      case other => fail(s"$other")
    }
    Ulm.ndarray(bytes, it.get("b")) match {
      case NdBools(Seq(2), d) => assert(d.toSeq == Seq(true, false))
      case other => fail(s"$other")
    }
    assert(it.get("s").asText() == "hello")
    assert(it.get("n").asDouble() == 2.25)
    assert(it.get("i").asLong() == 42L)
  }

  test("trajectory frames inherit constants and read calculator energies") {
    val fs = UlmTraj.frames(stableTraj)
    assert(fs.size == 3)
    assert(fs.map(_.energy) == Seq(Some(-3.25), Some(-3.5), Some(-3.75)))
    // frames 1-2 omit numbers/pbc/tags → inherited from frame 0
    assert(fs.forall(_.numbers == Seq(29, 29, 29, 29, 6, 8)))
    assert(fs.forall(_.tags == Seq(1, 1, 1, 1, 2, 2)))
    assert(fs.forall(_.pbc == Seq(true, true, false)))
    assert(fs(1).positions(4)(2) == 3.92)
    // cartesian → fractional against the diagonal cell
    val st = UlmTraj.toStructure(fs.head)
    assert(st.sites.map(_.element) == Seq("Cu", "Cu", "Cu", "Cu", "C", "O"))
    assert(math.abs(st.sites(1).frac_coords(0) - 0.25) < 1e-12)
    assert(math.abs(st.sites(4).frac_coords(2) - 3.9 / 14.0) < 1e-12)
  }

  test("anomaly screen: stable traj is good, desorbed traj is not") {
    val good = UlmTraj.Parser.parse("s.traj", stableTraj)
    assert(good.goodTrajectory && good.energies == Seq(-3.25, -3.5, -3.75))
    val bad = UlmTraj.Parser.parse("d.traj", desorbedTraj)
    assert(!bad.goodTrajectory && bad.energies == Seq(-3.25, -1.5))
  }

  test("corrupt and truncated files fail cleanly, not with buffer errors") {
    val rec = UlmTraj.Parser.parse("junk.traj", "not a ulm file".getBytes)
    assert(rec.energies.isEmpty && !rec.goodTrajectory)
    val truncated = stableTraj.take(60)
    val rec2 = UlmTraj.Parser.parse("t.traj", truncated)
    assert(rec2.energies.isEmpty && !rec2.goodTrajectory)
    intercept[IllegalArgumentException](Ulm.readItems("short".getBytes))
  }

  test("ULM round-trips random item sets (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genArrD = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
      .map(xs => VArrD(Seq(xs.size), xs.toArray))
    val genArrL = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      .map(xs => VArrL(Seq(xs.size), xs.toArray))
    val genItems = Gen.nonEmptyListOf(Gen.zip(genArrD, genArrL, Gen.chooseNum(-1e9, 1e9))
      .map { case (d, l, n) => VObj(Seq("d" -> d, "l" -> l, "n" -> VNum(n))) })
    val prop = Prop.forAll(genItems) { items =>
      val bytes = Ulm.write("prop", items)
      val (tag, _, back) = Ulm.readItems(bytes)
      tag == "prop" && back.size == items.size &&
        items.zip(back).forall { case (VObj(fs), node) =>
          val m = fs.toMap
          val VArrD(_, d) = m("d"): @unchecked
          val VArrL(_, l) = m("l"): @unchecked
          val VNum(n) = m("n"): @unchecked
          (Ulm.ndarray(bytes, node.get("d")) match {
            case Ulm.NdDoubles(_, dd) => dd.sameElements(d)
            case _ => false
          }) &&
          (Ulm.ndarray(bytes, node.get("l")) match {
            case Ulm.NdLongs(_, ll) => ll.sameElements(l)
            case _ => false
          }) && node.get("n").asDouble() == n
        }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("distributed S6 read: per-file records and per-frame rows") {
    val dir = Files.createTempDirectory("ulmtrajs")
    Files.write(dir.resolve("good.traj"), stableTraj)
    Files.write(dir.resolve("bad.traj"), desorbedTraj)
    val recs = Sources.readTrajectories(spark, dir.toString)
      .collect().sortBy(_.path)
    assert(recs.length == 2)
    assert(recs.count(_.goodTrajectory) == 1)
    val frames = Sources.readTrajectoryFrames(spark, dir.toString)
      .selectExpr("path", "frame", "energy", "natoms").as[(String, Int, Option[Double], Int)]
      .collect()
    assert(frames.length == 5)
    assert(frames.forall(_._4 == 6))
    assert(frames.filter(_._1.endsWith("good.traj")).map(_._3).flatten.sum == -10.5)
  }
}
