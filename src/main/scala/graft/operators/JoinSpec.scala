package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composite-join expression DSL of the reference, lowered to Catalyst
  * joins (`core/src/main/java/org/apache/hama/bsp/join/
  * CompositeInputFormat.java:43-52` grammar; ops at `:66-69`):
  *
  *   inner(tbl(a), tbl(b), ...)     sorted-merge equi-join, emit when ALL
  *                                  sources hold the key
  *                                  (InnerJoinRecordReader.java:40-48)
  *   outer(tbl(a), tbl(b), ...)     emit when ANY source holds the key
  *                                  (OuterJoinRecordReader.java:40-43)
  *   override(tbl(a), tbl(b), ...)  value from the RIGHTMOST source holding
  *                                  the key (OverrideRecordReader.java)
  *
  * The reference requires inputs pre-sorted and identically partitioned;
  * here Catalyst inserts the hash exchanges and picks SMJ vs broadcast from
  * stats, so the sortedness contract disappears. Per-key cross products of
  * duplicate keys match the reference's `JoinRecordReader` cross-product
  * iterator (`JoinRecordReader.java:40-113`) — the same semantics as SQL
  * equi-join duplicates.
  *
  * Each table contributes one value column; the composite result carries
  * the key plus one column per child, nullable when that side lacks the key
  * (the `TupleWritable` written-bitmask, `TupleWritable.java`).
  */
object JoinSpec {

  sealed trait Expr
  /** leaf: a named table with (key, value) columns */
  final case class Tbl(df: DataFrame, key: String, value: String) extends Expr
  final case class Inner(children: Seq[Expr]) extends Expr
  final case class Outer(children: Seq[Expr]) extends Expr
  /** rightmost-wins preferential override */
  final case class Override(children: Seq[Expr]) extends Expr

  /** Lower a join expression to a DataFrame with columns
    * (key, v0, v1, ..., v{n-1}) for composites or (key, v0) after override. */
  def compose(expr: Expr): DataFrame = expr match {
    case Tbl(df, key, value) =>
      df.select(col(key).as("key"), col(value).as("v0"))
    case Inner(children) => merge(children, "inner")
    case Outer(children) => merge(children, "full_outer")
    case Override(children) =>
      val joined = merge(children, "full_outer")
      val vals = joined.columns.filter(_.startsWith("v")).sorted.reverse.map(col)
      joined.select(col("key"), coalesce(vals.toIndexedSeq: _*).as("v0"))
  }

  private def merge(children: Seq[Expr], how: String): DataFrame = {
    require(children.size >= 2, "composite join needs >= 2 children")
    val frames = children.zipWithIndex.map { case (c, i) =>
      val f = compose(c)
      f.select(col("key") +: f.columns.filter(_.startsWith("v"))
        .map(c0 => col(c0).as(s"t${i}_$c0")): _*)
    }
    val joined = frames.reduce((a, b) => a.join(b, Seq("key"), how))
    val valCols = joined.columns.filter(_ != "key")
    joined.select(col("key") +: valCols.zipWithIndex
      .map { case (c0, i) => col(c0).as(s"v$i") }: _*)
  }
}
