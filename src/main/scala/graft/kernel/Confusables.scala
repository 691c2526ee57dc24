package graft.kernel

/** Edit-script instructions (the subset of sesdiff's model the reference
  * consumes — reference: src/confusables.rs, which matches patterns
  * against `sesdiff::shortest_edit_script` output).
  */
sealed trait EditInstr
object EditInstr {
  final case class Ident(s: String) extends EditInstr
  final case class Del(s: String) extends EditInstr
  final case class Ins(s: String) extends EditInstr
  final case class IdentOpts(v: Vector[String]) extends EditInstr
  final case class DelOpts(v: Vector[String]) extends EditInstr
  final case class InsOpts(v: Vector[String]) extends EditInstr
}

/** Shortest edit script between two strings: identity / deletion /
  * insertion runs (insertions and deletions grouped per hunk, deletions
  * first) — an LCS-backtrace diff equivalent to the sesdiff output shape
  * the reference matches confusables against.
  */
object EditScript {
  import EditInstr._

  def diff(a: String, b: String): Vector[EditInstr] = {
    val n = a.length
    val m = b.length
    // LCS DP
    val dp = Array.ofDim[Int](n + 1, m + 1)
    var i = n - 1
    while (i >= 0) {
      var j = m - 1
      while (j >= 0) {
        dp(i)(j) =
          if (a.charAt(i) == b.charAt(j)) dp(i + 1)(j + 1) + 1
          else math.max(dp(i + 1)(j), dp(i)(j + 1))
        j -= 1
      }
      i -= 1
    }
    // forward walk emitting per-hunk: deletions, then insertions, then
    // identity runs
    val out = Vector.newBuilder[EditInstr]
    val del = new StringBuilder
    val ins = new StringBuilder
    val ident = new StringBuilder
    def flushEdits(): Unit = {
      if (del.nonEmpty) { out += Del(del.toString); del.clear() }
      if (ins.nonEmpty) { out += Ins(ins.toString); ins.clear() }
    }
    def flushIdent(): Unit =
      if (ident.nonEmpty) { out += Ident(ident.toString); ident.clear() }
    var x = 0
    var y = 0
    while (x < n || y < m) {
      if (x < n && y < m && a.charAt(x) == b.charAt(y)) {
        flushEdits()
        ident.append(a.charAt(x)); x += 1; y += 1
      } else if (y == m || (x < n && dp(x + 1)(y) >= dp(x)(y + 1))) {
        flushIdent()
        del.append(a.charAt(x)); x += 1
      } else {
        flushIdent()
        ins.append(b.charAt(y)); y += 1
      }
    }
    flushEdits(); flushIdent()
    out.result()
  }

  /** Parse a confusable pattern script: sequence of `=[..]`, `-[..]`,
    * `+[..]` tokens, `|`-separated options inside brackets
    * (reference: sesdiff pattern syntax as used by confusables.rs:14-44
    * and FIXTURES.md §4). Anchors ^/$ handled by [[Confusable.parse]].
    */
  def parsePattern(s: String): Vector[EditInstr] = {
    val out = Vector.newBuilder[EditInstr]
    var i = 0
    while (i < s.length) {
      val op = s.charAt(i)
      require(op == '=' || op == '-' || op == '+',
        s"bad edit-script op '$op' in: $s")
      require(i + 1 < s.length && s.charAt(i + 1) == '[', s"expected [ in: $s")
      val close = s.indexOf(']', i + 2)
      require(close > 0, s"unterminated [ in: $s")
      val body = s.substring(i + 2, close)
      val opts = body.split('|').toVector
      out += ((op, opts.length > 1) match {
        case ('=', false) => Ident(body)
        case ('-', false) => Del(body)
        case ('+', false) => Ins(body)
        case ('=', true)  => IdentOpts(opts)
        case ('-', true)  => DelOpts(opts)
        case ('+', true)  => InsOpts(opts)
        case other        => throw new IllegalArgumentException(other.toString)
      })
      i = close + 1
    }
    out.result()
  }
}

/** A weighted confusable pattern (reference: src/confusables.rs:5-44).
  * weight > 1 favors candidates whose edit script instantiates the
  * pattern; < 1 penalizes.
  */
final case class Confusable(
    instrs: Vector[EditInstr],
    weight: Double,
    strictBegin: Boolean,
    strictEnd: Boolean
) {
  import EditInstr._

  /** Is this pattern instantiated in a reference edit script?
    * Faithful port of confusables.rs:47-128 including its sequential
    * reset behavior (a failed partial match does NOT retry the current
    * instruction at pattern offset 0 — it advances).
    */
  def foundIn(ref: Vector[EditInstr]): Boolean = {
    val l = instrs.length
    var matches = 0
    var i = 0
    while (i < ref.length) {
      val refInstr = ref(i)
      val instr = instrs(matches)
      val found = (instr, refInstr) match {
        case (Ins(s), Ins(sref)) => sref.endsWith(s)
        case (Del(s), Del(sref)) => sref.endsWith(s)
        case (Ident(s), Ident(sref)) =>
          if (matches == 0 && matches == l - 1) s == sref
          else if (matches == 0) sref.endsWith(s)
          else if (matches == l - 1) sref.startsWith(s)
          else s == sref
        case (InsOpts(v), Ins(sref)) => v.exists(sref.endsWith)
        case (DelOpts(v), Del(sref)) => v.exists(sref.endsWith)
        case (IdentOpts(v), Ident(sref)) =>
          v.exists { s =>
            if (matches == 0 && matches == l - 1) s == sref
            else if (matches == 0) sref.endsWith(s)
            else if (matches == l - 1) sref.startsWith(s)
            else s == sref
          }
        case _ => false
      }
      if (!found) {
        matches = 0
        if (strictBegin) return false
      } else {
        matches += 1
        if (matches == l) {
          return if (strictEnd) i == ref.length - 1 else true
        }
      }
      i += 1
    }
    false
  }
}

object Confusable {

  /** Parse `[^]script[$]` with weight (reference: confusables.rs:14-44). */
  def parse(script: String, weight: Double): Confusable = {
    val strictBegin = script.startsWith("^")
    val strictEnd = script.endsWith("$")
    val inner = script.substring(if (strictBegin) 1 else 0,
      script.length - (if (strictEnd) 1 else 0))
    Confusable(EditScript.parsePattern(inner), weight, strictBegin, strictEnd)
  }

  /** Product of weights of all confusables instantiated by the
    * input→candidate edit script; 1.0 when none
    * (reference: lib.rs:1733-1756).
    */
  def weightFor(confusables: Seq[Confusable], input: String,
      candidate: String): Double = {
    if (confusables.isEmpty) return 1.0
    val script = EditScript.diff(input, candidate)
    confusables.foldLeft(1.0) { (w, c) =>
      if (c.foundIn(script)) w * c.weight else w
    }
  }
}
