package graft

import java.nio.file.Files

import graft.odm.OdmPipeline
import org.scalacheck.{Gen, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Property-based ODM pipeline tests (SURVEY.md §5.2): random depth-6
  * trees with random tx-types, materialized as XML, pushed through the
  * real pipeline; invariants computed from the in-memory model.
  *
  * Invariants (reference semantics):
  *  1. command multiset == model walk: each node under the inherited
  *     eff-tx contributes per the emission table (update only at leaf,
  *     remove prunes its subtree, upsert degrades below study-event);
  *  2. replays are idempotent (same command set);
  *  3. no command references any node under a removed ancestor.
  */
class OdmPropertySpec extends SparkSuite {

  sealed case class Node(oid: String, tx: Option[String], kids: Seq[Node],
      dataType: String = "string", value: String = "v")

  private val genTx = Gen.oneOf(None, None, Some("Insert"), Some("Update"),
    Some("Remove"), Some("Upsert"))

  // oid == full path, so oids are globally unique across the tree
  private def genNode(oid: String, depth: Int): Gen[Node] =
    for {
      tx <- genTx
      nKids <- if (depth == 0) Gen.const(0) else Gen.choose(0, 2)
      kids <- Gen.sequence[Seq[Node], Node](
        (0 until nKids).map(i => genNode(s"${oid}x$i", depth - 1)))
    } yield Node(oid, tx, kids)

  private val genTree: Gen[Seq[Node]] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.sequence[Seq[Node], Node]((0 until n).map(i => genNode(s"SUB$i", 4))))

  private def xml(subjects: Seq[Node]): String = {
    def attr(n: Node) = n.tx.map(t => s""" TransactionType="$t"""").getOrElse("")
    def se(n: Node): String =
      s"""<StudyEventData StudyEventOID="${n.oid}"${attr(n)}>${n.kids.map(fm).mkString}</StudyEventData>"""
    def fm(n: Node): String =
      s"""<FormData FormOID="${n.oid}"${attr(n)}>${n.kids.map(ig).mkString}</FormData>"""
    def ig(n: Node): String =
      s"""<ItemGroupData ItemGroupOID="${n.oid}"${attr(n)}>${n.kids.map(it).mkString}</ItemGroupData>"""
    def it(n: Node): String =
      s"""<ItemData ItemOID="${n.oid}" DataType="string" Value="${n.value}"${attr(n)}/>"""
    val subs = subjects.map(s =>
      s"""<SubjectData SubjectKey="${s.oid}"${attr(s)}>${s.kids.map(se).mkString}</SubjectData>""")
    s"""<?xml version="1.0"?><ODM FileOID="PF"><ClinicalData StudyOID="PS">${subs.mkString}</ClinicalData></ODM>"""
  }

  /** The reference emission table, executed on the in-memory model. */
  private def expected(subjects: Seq[Node]): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    def eff(own: Option[String], parent: String): String =
      own.map(_.toLowerCase).getOrElse(parent)
    def walk(n: Node, level: Int, parentTx: String): Unit = {
      var tx = eff(n.tx, parentTx)
      if (level >= 3 && tx == "upsert") tx = "insert" // documented deviation
      val base = level match {
        case 1 => "subject"; case 2 => "study-event"; case 3 => "form"
        case 4 => "item-group"; case 5 => "item"
      }
      tx match {
        case "remove" => out += ((level, s"odm-import/remove-$base")) // no cascade
        case "update" =>
          if (level == 5) out += ((5, "odm-import/update-item"))
          else n.kids.foreach(walk(_, level + 1, "update"))
        case t =>
          val verb = if (t == "upsert" && level <= 2) "upsert" else "insert"
          out += ((level, s"odm-import/$verb-$base"))
          n.kids.foreach(walk(_, level + 1, t))
      }
    }
    subjects.foreach(walk(_, 1, "insert"))
    out.toSeq
  }

  test("command multiset matches the model walk; replay idempotent (×60 random trees)") {
    val prop = forAll(genTree) { subjects =>
      val f = Files.createTempFile("graft_prop", ".xml")
      Files.writeString(f, xml(subjects))
      val got = OdmPipeline.commands(spark, f.toString)
        .select("level", "name").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
      val want = expected(subjects).sorted
      val again = OdmPipeline.commands(spark, f.toString)
        .select("level", "name").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
      Files.deleteIfExists(f)
      got == want && again == got
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("no command references a node under a removed ancestor (×40 random trees)") {
    val prop = forAll(genTree) { subjects =>
      val f = Files.createTempFile("graft_prop2", ".xml")
      Files.writeString(f, xml(subjects))
      // collect every oid strictly below a removed node in the model
      val buried = scala.collection.mutable.Set.empty[String]
      def mark(n: Node): Unit = { buried += n.oid; n.kids.foreach(mark) }
      def walk(n: Node, parentTx: String): Unit = {
        val tx = n.tx.map(_.toLowerCase).getOrElse(parentTx)
        if (tx == "remove") n.kids.foreach(mark)
        else n.kids.foreach(walk(_, tx))
      }
      subjects.foreach(walk(_, "insert"))
      val cmds = OdmPipeline.commands(spark, f.toString)
        .select("params_json").collect().map(_.getString(0))
      Files.deleteIfExists(f)
      // oids are globally unique by construction (prefix encodes the path)
      buried.forall(oid => !cmds.exists(_.contains("\"" + oid + "\"")))
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
