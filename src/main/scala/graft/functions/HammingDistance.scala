package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for positionwise Hamming distance over
  * two bit-string columns — the verification kernel of the SimHash
  * near-dup family. Same preferred tier as [[JaccardSimilarity]]
  * (SURVEY §4): inlines into whole-stage codegen with no
  * catalyst↔scala boundary and compares `UTF8String` bytes directly —
  * the UDF it replaces transcoded both hashes to java.lang.String per
  * candidate pair.
  *
  * Semantics are IDENTICAL to Dedup.hammingUdf (spec-asserted):
  * positions up to min(len_a, len_b) compared; simhash strings are
  * '0'/'1' ASCII, so byte comparison == char comparison.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xa = $a.getBytes();
         |byte[] $xb = $b.getBytes();
         |int $n = Math.min($xa.length, $xb.length);
         |int $d = 0;
         |for (int k = 0; k < $n; k++) {
         |  if ($xa[k] != $xb[k]) $d += 1;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }
}

object HammingDistance {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
