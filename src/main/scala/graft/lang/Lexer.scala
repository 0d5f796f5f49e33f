package graft.lang

/** Token kinds of the grapho statement language (reference:
  * /root/reference/parser/token.go, keywords.go). Keywords are
  * case-insensitive; `true/false` lex as BOOL, `NULL` as NULLLIT.
  */
object Tok extends Enumeration {
  type Tok = Value
  val IDENT, STRINGLIT, NUMBER, BOOLLIT, NULLLIT,
      LPAREN, RPAREN, LT, GT, LE, GE, EQ, NEQ,
      COMMA, SEMI, COLON, EOF, ERROR = Value
}

final case class Token(kind: Tok.Tok, lit: String, line: Int, col: Int,
    quoted: Boolean = false) {
  /** Uppercased literal for keyword comparison. */
  def kw: String = lit.toUpperCase
}

final case class LexError(msg: String, line: Int, col: Int)
  extends RuntimeException(s"$msg at $line:$col")

/** Hand-rolled lexer for the grapho language (reference:
  * /root/reference/parser/lexer.go — same token surface, new
  * implementation). Supports `--` line and `/* */` block comments,
  * single-quoted strings with `''` escape (plus double-quoted strings
  * with `""` escape, as used by the reference README), and
  * backtick-quoted identifiers.
  */
final class Lexer(input: String) {
  private var pos = 0
  private var line = 1
  private var col = 1

  private def peek(n: Int = 0): Char =
    if (pos + n < input.length) input.charAt(pos + n) else '\u0000'

  private def advance(): Char = {
    val c = input.charAt(pos)
    pos += 1
    if (c == '\n') { line += 1; col = 1 } else col += 1
    c
  }

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_'

  def tokenize(): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var t = next()
    while (t.kind != Tok.EOF) { out += t; t = next() }
    out += t
    out.result()
  }

  @annotation.tailrec
  def next(): Token = {
    while (pos < input.length && peek().isWhitespace) advance()
    val (l, c) = (line, col)
    if (pos >= input.length) return Token(Tok.EOF, "", l, c)
    val ch = peek()
    if (ch == '-' && peek(1) == '-') {
      while (pos < input.length && peek() != '\n') advance()
      next()
    } else if (ch == '/' && peek(1) == '*') {
      advance(); advance()
      while (pos < input.length && !(peek() == '*' && peek(1) == '/')) advance()
      if (pos >= input.length) throw LexError("unterminated block comment", l, c)
      advance(); advance()
      next()
    } else ch match {
      case '(' => advance(); Token(Tok.LPAREN, "(", l, c)
      case ')' => advance(); Token(Tok.RPAREN, ")", l, c)
      case '<' =>
        advance()
        if (peek() == '=') { advance(); Token(Tok.LE, "<=", l, c) }
        else Token(Tok.LT, "<", l, c)
      case '>' =>
        advance()
        if (peek() == '=') { advance(); Token(Tok.GE, ">=", l, c) }
        else Token(Tok.GT, ">", l, c)
      case '=' => advance(); Token(Tok.EQ, "=", l, c)
      case '!' =>
        advance()
        if (peek() == '=') { advance(); Token(Tok.NEQ, "!=", l, c) }
        else throw LexError("expected '=' after '!'", l, c)
      case ',' => advance(); Token(Tok.COMMA, ",", l, c)
      case ';' => advance(); Token(Tok.SEMI, ";", l, c)
      case ':' => advance(); Token(Tok.COLON, ":", l, c)
      case '`' =>
        advance()
        val sb = new StringBuilder
        while (pos < input.length && peek() != '`') sb += advance()
        if (pos >= input.length) throw LexError("unterminated quoted identifier", l, c)
        advance()
        Token(Tok.IDENT, sb.toString, l, c, quoted = true)
      case q @ ('\'' | '"') =>
        advance()
        val sb = new StringBuilder
        var done = false
        while (!done) {
          if (pos >= input.length) throw LexError("unterminated string literal", l, c)
          if (peek() == q) {
            if (peek(1) == q) { sb += q; advance(); advance() }
            else { advance(); done = true }
          } else sb += advance()
        }
        Token(Tok.STRINGLIT, sb.toString, l, c)
      case d if d.isDigit =>
        val sb = new StringBuilder
        while (peek().isDigit) sb += advance()
        if (peek() == '.') { sb += advance(); while (peek().isDigit) sb += advance() }
        Token(Tok.NUMBER, sb.toString, l, c)
      case s if isIdentStart(s) =>
        val sb = new StringBuilder
        while (isIdentPart(peek())) sb += advance()
        val lit = sb.toString
        lit.toUpperCase match {
          case "TRUE" | "FALSE" => Token(Tok.BOOLLIT, lit.toLowerCase, l, c)
          case "NULL" => Token(Tok.NULLLIT, "null", l, c)
          case _ => Token(Tok.IDENT, lit, l, c)
        }
      case other =>
        throw LexError(s"unexpected character: '$other'", l, c)
    }
  }
}
