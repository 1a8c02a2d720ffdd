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
  /** user-registered composite op (the `bsp.join.define.<ident>` hook) */
  final case class UserOp(name: String, op: CompositeOp, children: Seq[Expr]) extends Expr

  /** A user-defined composite operation over already-composed children
    * (each a DataFrame with columns key, v0[, v1, …]) — the Spark analogue
    * of a user `ComposableRecordReader` registered through
    * `bsp.join.define.<ident>` (CompositeInputFormat.java:78-91). */
  trait CompositeOp extends Serializable {
    def apply(children: Seq[DataFrame]): DataFrame
  }

  /** Lower a join expression to a DataFrame with columns
    * (key, v0, v1, ..., v{n-1}) for composites or (key, v0) after override. */
  def compose(expr: Expr): DataFrame = expr match {
    case Tbl(df, key, value) =>
      df.select(col(key).as("key"), col(value).as("v0"))
    case Inner(children) => merge(children, "inner")
    case Outer(children) => merge(children, "full_outer")
    case Override(children) =>
      val joined = merge(children, "full_outer")
      // numeric sort on the v<i> suffix — lexicographic would put v10
      // between v1 and v2 and break rightmost-wins past 10 children
      val vals = joined.columns.filter(_.startsWith("v"))
        .sortBy(_.drop(1).toInt).reverse.map(col)
      joined.select(col("key"), coalesce(vals.toIndexedSeq: _*).as("v0"))
    case UserOp(_, op, children) => op(children.map(compose))
  }

  /** Full/inner merge of already-composed frames on `key`, value columns
    * renamed v0..vn left-to-right — shared by the built-in composites and
    * available to user [[CompositeOp]]s. */
  def mergeComposed(frames: Seq[DataFrame], how: String): DataFrame = {
    require(frames.size >= 2, "composite join needs >= 2 children")
    val tagged = frames.zipWithIndex.map { case (f, i) =>
      f.select(col("key") +: f.columns.filter(_.startsWith("v"))
        .map(c0 => col(c0).as(s"t${i}_$c0")): _*)
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("key"), how))
    val valCols = joined.columns.filter(_ != "key")
    joined.select(col("key") +: valCols.zipWithIndex
      .map { case (c0, i) => col(c0).as(s"v$i") }: _*)
  }

  private def merge(children: Seq[Expr], how: String): DataFrame =
    mergeComposed(children.map(compose), how)

  // ---- the expression-string grammar --------------------------------------
  //
  //   func ::= <ident>([<func>,]*<func>)
  //   func ::= tbl(<class>,"<path>")
  //
  // (CompositeInputFormat.java:43-52; recursive-descent reader analogous to
  // Parser.java:62-496.) `tbl`'s first argument named an InputFormat class
  // in the reference; here it names a source format the caller's resolver
  // interprets (e.g. "parquet"), and the quoted path names the input.
  // Default idents inner/outer/override are built in; any other ident
  // resolves through `defines` — the `bsp.join.define.<ident>` hook.

  /** Parse a composite-join expression string.
    *
    * @param input   expression in the grammar above
    * @param resolve maps a `tbl(<class>,"<path>")` leaf to a keyed table
    * @param defines user-op registry lookup (see [[definesFromConf]])
    */
  def parse(input: String, resolve: (String, String) => Tbl,
      defines: String => Option[CompositeOp] = _ => None): Expr = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"join expr: $msg at offset $pos in: $input")
    def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (pos >= input.length || input(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def readIdent(): String = {
      skipWs()
      val start = pos
      while (pos < input.length &&
        (input(pos).isLetterOrDigit || "_.$".contains(input(pos)))) pos += 1
      if (pos == start) fail("expected identifier")
      input.substring(start, pos)
    }
    def readQuoted(): String = {
      skipWs()
      if (pos >= input.length || input(pos) != '"') fail("expected '\"'")
      pos += 1
      val start = pos
      while (pos < input.length && input(pos) != '"') pos += 1
      if (pos >= input.length) fail("unterminated string")
      val s = input.substring(start, pos)
      pos += 1
      s
    }
    def parseFunc(): Expr = {
      val ident = readIdent()
      expect('(')
      if (ident == "tbl") {
        val cls = readIdent()
        expect(',')
        val path = readQuoted()
        expect(')')
        resolve(cls, path)
      } else {
        val children = scala.collection.mutable.ArrayBuffer(parseFunc())
        skipWs()
        while (pos < input.length && input(pos) == ',') {
          pos += 1
          children += parseFunc()
          // re-skip before re-checking for a separator: without this,
          // whitespace before the SECOND comma (`inner(a , b , c)`) ends
          // the child list early and the `)` check trips on the comma
          skipWs()
        }
        expect(')')
        ident match {
          case "inner" => Inner(children.toSeq)
          case "outer" => Outer(children.toSeq)
          case "override" => Override(children.toSeq)
          case other => defines(other)
            .map(op => UserOp(other, op, children.toSeq))
            .getOrElse(fail(s"unknown op '$other' (no graft.join.define.$other)"))
        }
      }
    }
    val e = parseFunc()
    skipWs()
    if (pos != input.length) fail("trailing input")
    e
  }

  /** User-op registry backed by session conf: `graft.join.define.<ident>`
    * names a [[CompositeOp]] class instantiated via `Class.forName` — the
    * same mechanism as the reference's `bsp.join.define.<ident>` job conf
    * (CompositeInputFormat.java:78-91). */
  def definesFromConf(spark: org.apache.spark.sql.SparkSession): String => Option[CompositeOp] =
    name => spark.conf.getOption(s"graft.join.define.$name")
      .map(cn => Class.forName(cn).getDeclaredConstructor().newInstance()
        .asInstanceOf[CompositeOp])
}

/** Example user composite op: full-outer merge, then one value column
  * concatenating every child's (non-null) value with '|'. Registered in
  * declared queries via `graft.join.define.concat2`. */
class ConcatValsOp extends JoinSpec.CompositeOp {
  override def apply(children: Seq[DataFrame]): DataFrame = {
    val joined = JoinSpec.mergeComposed(children, "full_outer")
    val vals = joined.columns.filter(_.startsWith("v"))
      .sortBy(_.drop(1).toInt).map(col) // numeric: v10 sorts after v9
    joined.select(col("key"), concat_ws("|", vals.toIndexedSeq: _*).as("v0"))
  }
}
