package graft

import graft.operators.JoinSpec
import graft.operators.JoinSpec.{Expr, Inner, Outer, Override, Tbl, UserOp}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Round-trip property for the composite-join expression grammar: any
  * well-formed tree, rendered to its string form and parsed back, yields
  * the same tree. The hand-written cases in JoinSpecSpec sample the
  * grammar; this drives parse() through arbitrary nesting depths, child
  * counts, whitespace, and user-op names — the space where a
  * recursive-descent parser's offset handling actually breaks.
  */
class JoinSpecPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dummy = Seq((1L, "x")).toDF("k", "v")

  private val userOpNames = Seq("merge_max", "pick2", "coalesce_all")
  private val noopOp = new JoinSpec.CompositeOp {
    override def apply(children: Seq[org.apache.spark.sql.DataFrame]) = children.head
  }

  // leaf paths exercise the quoted-string reader (slashes, dots, spaces)
  private val pathGen: Gen[String] =
    Gen.oneOf("/data/a.parquet", "hdfs://nn/warehouse/t 1", "rel/p.txt")
  private val clsGen: Gen[String] =
    Gen.oneOf("seq", "org.x.KVFormat", "Text$Fmt")

  private def exprGen(depth: Int): Gen[Expr] = {
    val leaf = for { c <- clsGen; p <- pathGen } yield Tbl(dummy, c, p)
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> childrenGen(depth).map(Inner(_)),
      1 -> childrenGen(depth).map(Outer(_)),
      1 -> childrenGen(depth).map(Override(_)),
      1 -> (for { n <- Gen.oneOf(userOpNames); cs <- childrenGen(depth) }
             yield UserOp(n, noopOp, cs)))
  }
  private def childrenGen(depth: Int): Gen[Seq[Expr]] =
    Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, exprGen(depth - 1)))

  /** the grammar's printed form, with seeded random extra whitespace */
  private def render(e: Expr, r: scala.util.Random): String = {
    def ws = if (r.nextBoolean()) " " else ""
    e match {
      case Tbl(_, cls, path) => s"tbl($ws$cls$ws,$ws\"$path\"$ws)"
      case Inner(cs) => cs.map(render(_, r)).mkString(s"inner($ws", s"$ws,$ws", s"$ws)")
      case Outer(cs) => cs.map(render(_, r)).mkString(s"outer($ws", s"$ws,$ws", s"$ws)")
      case Override(cs) => cs.map(render(_, r)).mkString(s"override($ws", s"$ws,$ws", s"$ws)")
      case UserOp(n, _, cs) => cs.map(render(_, r)).mkString(s"$n($ws", s"$ws,$ws", s"$ws)")
    }
  }

  /** structural shape with Tbl collapsed to (cls, path) — the DataFrame
    * inside Tbl has no equality, so compare the parse-relevant skeleton */
  private def shape(e: Expr): Any = e match {
    case Tbl(_, cls, path) => ("tbl", cls, path)
    case Inner(cs) => ("inner", cs.map(shape))
    case Outer(cs) => ("outer", cs.map(shape))
    case Override(cs) => ("override", cs.map(shape))
    case UserOp(n, _, cs) => (n, cs.map(shape))
  }

  test("parse(render(tree)) == tree for arbitrary trees and whitespace") {
    val resolve: (String, String) => Tbl = (c, p) => Tbl(dummy, c, p)
    val defines: String => Option[JoinSpec.CompositeOp] =
      n => if (userOpNames.contains(n)) Some(noopOp) else None
    (0 until 40).foreach { i =>
      val tree = exprGen(3).pureApply(Gen.Parameters.default, Seed(1234L + i))
      val rendered = render(tree, new scala.util.Random(55L + i))
      val parsed = JoinSpec.parse(rendered, resolve, defines)
      assert(shape(parsed) == shape(tree), s"round-trip failed for: $rendered")
    }
  }

  test("malformed inputs fail loudly with offset context") {
    val resolve: (String, String) => Tbl = (c, p) => Tbl(dummy, c, p)
    Seq("inner(tbl(a,\"p\")", "inner()", "tbl(a)", "unknown(tbl(a,\"p\"),tbl(b,\"q\"))",
        "inner(tbl(a,\"unterminated))").foreach { bad =>
      val e = intercept[IllegalArgumentException](JoinSpec.parse(bad, resolve))
      assert(e.getMessage.contains("join expr:"), s"unexpected message: ${e.getMessage}")
    }
  }
}
