package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PyLiteral._
import graft.sources.NexusTree.{NexusDataset, NexusGroup}

/** Golden tests for the pure-JVM HDF5 reader against the reference's
  * REAL NeXus fixtures (ref: test-data/README.md:6-46 — instrument-
  * pruned copies of actual YMIR/CODA acquisition files). Expected
  * values are cross-checked against the raw file bytes and the
  * reference's own schema for these fixtures
  * (ref: resources/small-ymir.imsc.yml.example NXS paths).
  *
  * small-ymir exercises: superblock v0, classic TREE/SNOD root, v2
  * OHDR children, DENSE link storage (FRHP fractal heap + BTLF name
  * index — /entry has 20 links), vlen strings in GCOL, UTF-8 names.
  */
class Hdf5ReaderSpec extends AnyFunSuite {
  val ymir = "/root/reference/test-data/small-ymir.hdf"
  val coda = "/root/reference/test-data/small-coda.hdf"

  private def str(root: NexusGroup, path: String): String =
    NexusTree.readString(root, path).getOrElse(fail(s"missing $path"))

  test("small-ymir: scalar datasets at the imsc schema's NXS paths") {
    val root = Hdf5Reader.read(ymir)
    assert(str(root, "/entry/entry_identifier_uuid") ==
      "90d87f9a-950f-11ef-9101-fa163e943f63") // job_id
    assert(str(root, "/entry/experiment_identifier") == "876380") // proposal_id
    assert(str(root, "/entry/title") == "october 28th, lego test 1, cont")
    assert(str(root, "/entry/instrument/name") == "YMIR")
    assert(str(root, "/entry/start_time") == "2024-10-28T09:32:35.895Z")
    assert(str(root, "/entry/end_time") == "2024-10-28T09:34:50.524Z")
    assert(str(root, "/entry/entry_identifier") == "11465") // run_number
    assert(str(root, "/entry/sample/name") == "some sample")
  }

  test("small-ymir: wildcard user_*/name expansion (dense links, UTF-8)") {
    val root = Hdf5Reader.read(ymir)
    val paths = NexusTree.extractPaths(root, List("entry", "user_.*", "name"))
    val names = paths.flatMap(p => NexusTree.readString(root, s"/$p"))
    assert(names.size == 12, s"got $names")
    // UTF-8 link names and values survive (raw bytes are \xc3\xb8 = ø)
    assert(names.contains("Søren Schmidt"))
    assert(names.take(3) == Vector(
      "Anders Pettersson", "Fredrik Bolmsten", "George ONeill"))
  }

  test("small-coda: second real fixture parses with matching goldens") {
    val root = Hdf5Reader.read(coda)
    assert(str(root, "/entry/entry_identifier_uuid") ==
      "f22acb1c-950b-11ef-a3ef-fa163e9aae0a")
    assert(str(root, "/entry/experiment_identifier") == "443503")
    assert(str(root, "/entry/instrument/name") == "ODIN")
    assert(str(root, "/entry/title") == "odin")
    assert(str(root, "/entry/entry_identifier") == "31010")
    assert(str(root, "/entry/definition") == "NXtomo")
    assert(str(root, "/entry/sample/name") == "A Sample")
    assert(str(root, "/entry/start_time") == "2024-10-28T09:06:41.186Z")
    // multi-line vlen string dataset in the pruned publication group
    assert(str(root, "/entry/instrument/odin_publication/doi") ==
      "https://doi.org/10.1016/j.nima.2020.163402")
    val users = NexusTree.extractPaths(root, List("entry", "user_.*", "name"))
    assert(users.size == 6)
  }

  test("readJson round-trips through the engine's JSON tree encoding") {
    // The IngestStream path is readJson → NexusTree.fromJson; the
    // round-trip must preserve every dataset the direct read sees.
    def flatten(n: NexusTree.NexusNode, p: String = ""): Vector[(String, String)] = n match {
      case g: NexusGroup => g.children.flatMap { case (k, c) => flatten(c, s"$p/$k") }
      case NexusDataset(v, _) => Vector(p -> pyStr(v))
    }
    for (f <- Seq(ymir, coda)) {
      val direct = flatten(Hdf5Reader.read(f))
      val viaJson = flatten(NexusTree.fromJson(Hdf5Reader.readJson(f)))
      assert(viaJson == direct, s"round-trip mismatch for $f")
    }
  }

  test("F11: corrupt, truncated, missing, or non-HDF5 files yield None") {
    val noRetry = Hdf5Reader.fileReaderWith(Seq.empty)
    val dir = java.nio.file.Files.createTempDirectory("graft_hdf5")
    val truncated = dir.resolve("trunc.hdf")
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ymir))
    java.nio.file.Files.write(truncated, all.take(512).toArray)
    val garbage = dir.resolve("garbage.nxs")
    java.nio.file.Files.write(garbage, "not an hdf5 file at all".getBytes)

    assert(noRetry(truncated.toString).isEmpty)
    assert(noRetry(garbage.toString).isEmpty)
    assert(noRetry(dir.resolve("missing.hdf").toString).isEmpty)
    assert(noRetry("/etc/hostname").isEmpty)
    assert(noRetry(null).isEmpty)
    // and the real fixtures DO read through the same entry point
    assert(Hdf5Reader.fileReader(ymir).nonEmpty)
  }

  test("failure classes are distinguished: io vs not_hdf5 vs parse vs too_large") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hdf5c")
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ymir))
    val truncated = dir.resolve("trunc.hdf")
    java.nio.file.Files.write(truncated, all.take(600).toArray) // real magic, cut body
    val garbage = dir.resolve("garbage.nxs")
    java.nio.file.Files.write(garbage, "plain text".getBytes)
    // sparse file over the 2 GiB guard: instant to create, ~0 disk
    val big = dir.resolve("big.hdf")
    val raf = new java.io.RandomAccessFile(big.toFile, "rw")
    try raf.setLength(Int.MaxValue.toLong + 100) finally raf.close()

    assert(Hdf5Reader.readClassified(truncated.toString).swap.exists(_.startsWith("parse:")))
    assert(Hdf5Reader.readClassified(garbage.toString).swap.exists(_.startsWith("not_hdf5:")))
    assert(Hdf5Reader.readClassified(dir.resolve("nope.hdf").toString).swap.exists(_.startsWith("io:")))
    assert(Hdf5Reader.readClassified(big.toString).swap.exists(_.startsWith("too_large:")),
      "a merely-too-big file must NOT read as corrupt")
    assert(Hdf5Reader.readClassified(ymir).isRight)
  }

  test("any extension is attempted: magic bytes decide, not the file name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hdf5e")
    val odd = dir.resolve("run0001.nexus-data") // extension the old gate skipped
    java.nio.file.Files.copy(java.nio.file.Paths.get(ymir), odd)
    assert(Hdf5Reader.fileReaderWith(Seq.empty)(odd.toString).nonEmpty)
  }

  test("transient IO failures retry with clamped delays; parse failures do not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hdf5r")
    val appearing = dir.resolve("late.hdf")
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    // the file "arrives" during the first retry sleep (filewriter just
    // finished moving it into place)
    val reader = Hdf5Reader.fileReaderWith(Seq(0.001, 60.0), sleeper = { ms =>
      slept += ms
      java.nio.file.Files.copy(java.nio.file.Paths.get(ymir), appearing)
    })
    assert(reader(appearing.toString).nonEmpty)
    assert(slept.toSeq == Seq(1000L)) // 0.001 clamped up to 1 s; no second retry

    // non-IO failures never retry
    val garbage = dir.resolve("g.hdf")
    java.nio.file.Files.write(garbage, "junk".getBytes)
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(Hdf5Reader.fileReaderWith(Seq(1.0), sleeper = sleeps2 += _)(garbage.toString).isEmpty)
    assert(sleeps2.isEmpty)
  }
}
