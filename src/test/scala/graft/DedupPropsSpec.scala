package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.extensions.Dedup

/** Property guards for the intra-doc line-dedup grain (d25): the Spark
  * operator must agree with a plain-Scala first-occurrence reference
  * model on dense-duplicate corpora, and a deduplicated doc must be a
  * fixed point (idempotence — the invariant that makes the pass safe to
  * re-run over partially-cleaned snapshots). */
object DedupPropsSpec extends Properties("graft.dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  // small line vocabulary (including the blank line) so in-doc
  // duplicates are dense; doc and corpus sizes vary down to empty
  private val lineGen: Gen[String] =
    Gen.frequency(10 -> Gen.choose(1, 12).map(i => s"line $i"),
      2 -> Gen.const(""))
  private val docGen: Gen[List[String]] =
    Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, lineGen))
  private val corpusGen: Gen[List[List[String]]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, docGen))

  private def model(lines: List[String]): List[String] =
    lines.foldLeft((List.empty[String], Set.empty[String])) {
      case ((acc, seen), l) =>
        if (seen(l)) (acc, seen) else (l :: acc, seen + l)
    }._1.reverse

  private def toDf(corpus: List[List[String]]) =
    corpus.zipWithIndex
      .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
      .toDF("doc_id", "text")

  // mkString/split round-trip: a zero-line doc serializes to "" which
  // split() reads back as the single empty line — the model must see
  // what the operator sees
  private def roundTrip(ls: List[String]): List[String] =
    if (ls.isEmpty) List("") else ls

  property("intraDocLineDedup = first-occurrence reference model") =
    forAll(corpusGen) { corpus =>
      val got = Dedup.intraDocLineDedup(toDf(corpus), "doc_id", "text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList
      got == corpus.zipWithIndex.map { case (ls0, i) =>
        val ls = roundTrip(ls0)
        val kept = model(ls)
        (i.toLong, ls.size.toLong, kept.size.toLong, kept.mkString("\n"))
      }
    }

  property("intraDocLineDedup is idempotent (kept_text is a fixed point)") =
    forAll(corpusGen) { corpus =>
      val once = Dedup.intraDocLineDedup(toDf(corpus), "doc_id", "text")
        .select(col("doc_id"), col("kept_text").as("text"))
      val first = once.as[(Long, String)].collect().sortBy(_._1).toList
      val twice = Dedup.intraDocLineDedup(once, "doc_id", "text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList
      twice.forall { case (_, n, k, _) => n == k } &&
        twice.map(t => (t._1, t._4)) == first
    }
}
