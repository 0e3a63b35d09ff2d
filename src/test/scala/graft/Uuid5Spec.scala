package graft

import java.util.UUID

import graft.functions.Uuid5
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests mirroring the reference's gen-cmd-id suite
  * (/root/reference/test/lens/import_clinical_data_test.clj:261-280):
  * fixed JVM-independence vector, param-order insensitivity, and
  * distinctness properties (×1000 via ScalaCheck).
  */
class Uuid5Spec extends AnyFunSuite {

  // The reference fixture is #uuid "2a302e1b-3cb4-425e-bca9-db7831d81e69d" —
  // a 13-hex-digit last group that JDK 8 parsed as the hex long
  // 0x0db7831d81e69d (JDK 17's fromString rejects it); built from longs here.
  private val batchCmdId =
    new UUID(0x2a302e1b3cb4425eL, (0xbca9L << 48) | 0x0db7831d81e69dL)

  test("RFC 4122 v5 golden: DNS namespace / python.org") {
    assert(Uuid5.uuid5(UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8"),
      "python.org").toString === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("nil-namespace golden (study-id derivation shape)") {
    assert(Uuid5.uuid5(Uuid5.NilUuid, "S1").toString ===
      "e0613ddc-8747-503d-8c70-2a4d9589ff08")
  }

  test("gen-cmd-id reference golden (JVM independence, test :261-267)") {
    val id = Uuid5.genCmdId(batchCmdId, ":odm-import/insert-subject",
      Seq(":study-id" -> "S1", ":subject-key" -> "SUB1"))
    assert(id.toString === "75e752d9-c2bf-53dc-82dd-97f4c05363ec")
  }

  test("gen-cmd-id: UUID-shaped value_string hashes as a plain string, not 16 raw bytes") {
    // the reference's params are TYPED — only the id params are UUIDs;
    // a value_string that merely looks like a UUID stays a string
    val u = "2a302e1b-3cb4-425e-bcad-b7831d81e69d"
    val json = s"""{"item_id":"$u","value_string":"$u"}"""
    val got = Uuid5.genCmdIdJson(batchCmdId.toString, "odm-import/update-item", json, "F1")
    // expected: item-id as raw UUID bytes, value as UTF-8 string bytes
    val expected = Uuid5.uuid5Parts(batchCmdId, Seq(
      ":odm-import/update-item".getBytes("UTF-8"),
      ":file-oid".getBytes("UTF-8"), "F1".getBytes("UTF-8"),
      ":item-id".getBytes("UTF-8"),
      java.nio.ByteBuffer.allocate(16)
        .putLong(java.util.UUID.fromString(u).getMostSignificantBits)
        .putLong(java.util.UUID.fromString(u).getLeastSignificantBits).array(),
      ":value".getBytes("UTF-8"), u.getBytes("UTF-8"))).toString
    assert(got === expected)
  }

  test("gen-cmd-id param order does not matter (test :268-270)") {
    assert(Uuid5.genCmdId(batchCmdId, ":foo", Seq(":a" -> "1", ":b" -> "2")) ===
      Uuid5.genCmdId(batchCmdId, ":foo", Seq(":b" -> "2", ":a" -> "1")))
  }

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(1000), p)
    assert(res.passed, res.status.toString)
  }

  test("distinct names => distinct ids (defspec ×1000, test :272-275)") {
    check(forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      a == b || Uuid5.genCmdId(batchCmdId, a, Seq.empty) !=
        Uuid5.genCmdId(batchCmdId, b, Seq.empty)
    })
  }

  test("distinct param values => distinct ids (defspec ×1000, test :277-280)") {
    check(forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      a == b || Uuid5.genCmdId(batchCmdId, ":foo", Seq(":bar" -> a)) !=
        Uuid5.genCmdId(batchCmdId, ":foo", Seq(":bar" -> b))
    })
  }

  test("id chain is deterministic and parent-scoped (§1.3)") {
    val studyId = Uuid5.uuid5(Uuid5.NilUuid, "S1")
    val subj1 = Uuid5.uuid5(studyId, "SK01")
    val subj1Again = Uuid5.uuid5(Uuid5.uuid5(Uuid5.NilUuid, "S1"), "SK01")
    assert(subj1 === subj1Again)
    assert(subj1 !== Uuid5.uuid5(studyId, "SK02"))
    assert(Uuid5.uuid5(studyId, "SK01") !==
      Uuid5.uuid5(Uuid5.uuid5(Uuid5.NilUuid, "S2"), "SK01"))
  }
}
