package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step that precedes any content hash: visually
  * identical strings with different codepoint sequences (composed é
  * vs e + combining accent) must collapse to one digest or every
  * downstream dedup/fingerprint silently treats them as distinct
  * documents. Codegen'd (stays inside WholeStageCodegen with the scan);
  * the ASCII fast path skips the Normalizer entirely, which at corpus
  * scale is nearly every row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Referenced from generated code — must stay public and cheap. The
    * all-ASCII check is a single byte scan; ASCII is closed under NFC,
    * so the common case allocates nothing.
    */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm.equals(str)) s else UTF8String.fromString(norm)
    }
  }

  def apply(col: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(col)))
}
