package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE application — shared by the driver-side
  * [[graft.ops.BpeTrainer.BpeModel]] twin and the distributed
  * [[BpeEncode]] expression, so the two can never diverge. */
object BpeCoder {

  val Eow = "</w>"

  /** rank lookup key — a space can never appear inside a symbol
    * (words are whitespace-split), so it is a safe separator. */
  def key(a: String, b: String): String = a + " " + b

  /** Encode one whitespace-free word: repeatedly apply the
    * lowest-rank applicable merge (GPT-2-style greedy apply). */
  def encodeWord(word: String,
      ranks: java.util.Map[String, Integer]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Vector[String] = word.map(_.toString).toVector :+ Eow
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(key(syms(i), syms(i + 1)))
        if (r != null && r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
        syms.drop(at + 2)
    }
    syms
  }

  def encodeText(text: String,
      ranks: java.util.Map[String, Integer]): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq
      .flatMap(encodeWord(_, ranks))
}

/** Per-plan compiled merge table, referenced from generated code (the
  * [[PqAdcLit]] stance: the foldable literal materializes ONCE into a
  * lookup structure; rows never carry or re-parse it). */
final class BpeTable(val ranks: java.util.HashMap[String, Integer])
    extends Serializable {
  def encode(s: UTF8String): ArrayData = {
    val toks = BpeCoder.encodeText(s.toString, ranks)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }
}

/** `graft_bpe_encode(text, merges)` — distributed BPE tokenization.
  * `merges` must be a foldable array<array<string>> of [a, b] pairs in
  * merge-priority order (earlier = higher priority), normally produced
  * by [[graft.ops.BpeTrainer.train]] and attached via
  * `BpeModel.encodeCol`. Output: array<string> subword tokens, each
  * word's last token `</w>`-terminated. A pure per-row projection —
  * one corpus pass, no shuffle; the generated code makes one virtual
  * call into the compiled table per row. */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, ArrayType(ArrayType(StringType)))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val table: BpeTable = {
    require(right.foldable, "graft_bpe_encode: merges must be a literal")
    val arr = right.eval().asInstanceOf[ArrayData]
    val ranks = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < arr.numElements()) {
      val pair = arr.getArray(i)
      require(pair.numElements() == 2,
        s"graft_bpe_encode: merge entry $i is not an [a, b] pair")
      ranks.put(BpeCoder.key(pair.getUTF8String(0).toString,
        pair.getUTF8String(1).toString), i)
      i += 1
    }
    new BpeTable(ranks)
  }

  override def nullSafeEval(t: Any, unused: Any): Any =
    table.encode(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.encode($t);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
