package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a content fingerprint of a string column as a native
  * Catalyst expression with codegen (SURVEY §2.7 row 53) — the document-
  * fingerprint primitive for dedup/lineage. A custom `Expression` (not a
  * Scala UDF) so the hash participates in WholeStageCodegen: no
  * serialization boundary, no null-boxing, vectorizes with the scan.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  protected override def nullSafeEval(input: Any): Any =
    FnvHash64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)
}

object FnvHash64 {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** FNV-1a over raw bytes; referenced from generated code — must stay
    * public, static-reachable, and allocation-free.
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** Column wrapper: `fnv64(col)`. */
  def apply(c: Column): Column = Bridge.column(FnvHash64(Bridge.expression(c)))
}
