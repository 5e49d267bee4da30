package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.codec.PostingCodec
import graft.tokenizer.Tokenizer

/** Native Catalyst expressions over the engine's custom data formats —
  * the places where built-in functions genuinely cannot express the
  * semantics (the delta+varint posting blob is an engine-defined byte
  * format, and the frozen tokenizer's exact rules must come from the one
  * tested implementation, not be re-derived per query).
  *
  * Registered by [[GraftExtensions]] (SparkSessionExtensions) so plain
  * SQL can inspect a persisted index:
  *
  *   SELECT term, explode(posting_doc_ids(df, postingsBlob)) AS docId
  *   FROM postings WHERE term = 'spark'
  *
  * All are null-safe eval expressions with CodegenFallback: they sit at
  * plan leaves over binary columns, where interpreted eval is not the
  * bottleneck (the decode itself dominates); inputs/outputs are standard
  * Catalyst types so surrounding stages stay in codegen.
  */
object GraftExpressions {

  /** posting_doc_ids(df, blob) -> array<bigint> of the list's docIds. */
  case class PostingDocIds(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(df: Any, blob: Any): Any = {
      val decoded = PostingCodec.decode(df.asInstanceOf[Long],
        blob.asInstanceOf[Array[Byte]])
      new GenericArrayData(decoded.map(_._1))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "posting_doc_ids"
  }

  /** posting_tfs(df, blob) -> array<struct<docId:bigint, tf:int>>. */
  case class PostingTfs(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("docId", LongType, nullable = false),
      StructField("tf", IntegerType, nullable = false))), containsNull = false)
    override def nullSafeEval(df: Any, blob: Any): Any = {
      val decoded = PostingCodec.decode(df.asInstanceOf[Long],
        blob.asInstanceOf[Array[Byte]])
      new GenericArrayData(decoded.map { case (docId, positions) =>
        InternalRow(docId, positions.length)
      }.toArray[Any])
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "posting_tfs"
  }

  /** posting_entries(df, blob) ->
    * array<struct<docId:bigint, positions:array<bigint>>> — the FULL
    * decode, ONE pass per blob. Position analytics (proximity, spans)
    * must use this, not per-doc [[PostingPositions]] probes, which
    * re-walk the blob once per requested doc.
    */
  case class PostingEntries(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("docId", LongType, nullable = false),
      StructField("positions", ArrayType(LongType, containsNull = false),
        nullable = false))), containsNull = false)
    override def nullSafeEval(df: Any, blob: Any): Any = {
      val decoded = PostingCodec.decode(df.asInstanceOf[Long],
        blob.asInstanceOf[Array[Byte]])
      new GenericArrayData(decoded.map { case (docId, positions) =>
        InternalRow(docId, new GenericArrayData(positions))
      }.toArray[Any])
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "posting_entries"
  }

  /** posting_positions(df, blob, docId) -> array<bigint> (empty when the
    * doc is absent from the list).
    */
  case class PostingPositions(first: Expression, second: Expression, third: Expression)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(first, second, third)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def eval(input: InternalRow): Any = {
      val df = first.eval(input)
      val blob = second.eval(input)
      val docId = third.eval(input)
      if (df == null || blob == null || docId == null)
        return new GenericArrayData(Array.emptyLongArray)
      val cur = new PostingCodec.Cursor(df.asInstanceOf[Long],
        Array.empty, blob.asInstanceOf[Array[Byte]])
      // linear cursor walk (no blocks passed): leaf-level inspection only
      val target = docId.asInstanceOf[Long]
      while (cur.next() && cur.docId < target) {}
      if (cur.docId == target) new GenericArrayData(cur.positions)
      else new GenericArrayData(Array.emptyLongArray)
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(first = cs(0), second = cs(1), third = cs(2))
    override def prettyName: String = "posting_positions"
  }

  /** graft_tokenize(text) -> array<string>: the FROZEN body-token rules
    * from the one tested Tokenizer object.
    */
  case class GraftTokenize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(text: Any): Any =
      new GenericArrayData(Tokenizer.bodyTokens(text.toString)
        .map(UTF8String.fromString(_)).toArray[Any])
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "graft_tokenize"
  }

  // Column-API wrappers (Spark 4: Column <-> Expression bridging lives in
  // sql.classic.ExpressionUtils)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
  private def co(e: Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  def posting_doc_ids(df: Column, blob: Column): Column =
    co(PostingDocIds(ex(df), ex(blob)))
  def posting_tfs(df: Column, blob: Column): Column =
    co(PostingTfs(ex(df), ex(blob)))
  def posting_entries(df: Column, blob: Column): Column =
    co(PostingEntries(ex(df), ex(blob)))
  def graft_tokenize(text: Column): Column =
    co(GraftTokenize(ex(text)))
}

/** SparkSessionExtensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Can also be
  * applied to a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExpressions._
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("posting_doc_ids"),
      new ExpressionInfo(classOf[PostingDocIds].getName, "posting_doc_ids"),
      (children: Seq[Expression]) => PostingDocIds(children(0), children(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("posting_tfs"),
      new ExpressionInfo(classOf[PostingTfs].getName, "posting_tfs"),
      (children: Seq[Expression]) => PostingTfs(children(0), children(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("posting_entries"),
      new ExpressionInfo(classOf[PostingEntries].getName, "posting_entries"),
      (children: Seq[Expression]) => PostingEntries(children(0), children(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("posting_positions"),
      new ExpressionInfo(classOf[PostingPositions].getName, "posting_positions"),
      (children: Seq[Expression]) => PostingPositions(children(0), children(1), children(2))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[GraftTokenize].getName, "graft_tokenize"),
      (children: Seq[Expression]) => GraftTokenize(children.head)))
  }
}

object GraftExtensions {
  import GraftExpressions._
  /** Register the SQL functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("posting_doc_ids",
      cs => PostingDocIds(cs(0), cs(1)), "built-in")
    reg.createOrReplaceTempFunction("posting_tfs",
      cs => PostingTfs(cs(0), cs(1)), "built-in")
    reg.createOrReplaceTempFunction("posting_entries",
      cs => PostingEntries(cs(0), cs(1)), "built-in")
    reg.createOrReplaceTempFunction("posting_positions",
      cs => PostingPositions(cs(0), cs(1), cs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_tokenize",
      cs => GraftTokenize(cs.head), "built-in")
  }
}
