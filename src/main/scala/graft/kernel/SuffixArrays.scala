package graft.kernel

/** Suffix-array kernel for the substring-containment dedup pass.
  *
  * Prefix-doubling construction (Manber-Myers style): O(n log^2 n)
  * comparisons, allocation-light (rank pairs packed into one sorted
  * Long array per round). Containment probes then run in
  * O(|probe| log n) binary search each — the win over a per-pair
  * `instr` scan (O(|host|*|probe|)) appears when MANY probes test the
  * SAME host, which is exactly the shape the min-shingle-anchor join
  * produces for long hosts (a host meets up to bucketCap probes per
  * distinct shingle). DedupPipeline selects this path per host group;
  * the per-pair `instr` form remains the default for short-transcript
  * corpora where suffix-array build cost dominates.
  *
  * Bounded to strings < 2^20 chars (rank/index bit-packing); transcripts
  * are orders of magnitude shorter. The 10^12-row deployment keeps the
  * same per-host kernel — suffix arrays are built per row group inside a
  * task, never across rows, so no distributed construction is needed.
  */
object SuffixArrays {

  /** Exclusive length bound of [[build]] (rank/index bit-packing).
    * Callers with longer hosts must use a direct scan instead.
    */
  val MaxLength: Int = 1 << 20

  /** Suffix array of `s`: indices of all suffixes in lexicographic
    * order. Empty input yields an empty array.
    */
  def build(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    require(n < MaxLength, s"suffix-array kernel supports |s| < 2^20, got $n")
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s.charAt(i); i += 1 }
    // packed(i) = rank(pos) << 41 | (rank(pos+k)+1) << 20 | pos
    // (first-rank field also holds initial 16-bit char codes, hence 41)
    val packed = new Array[Long](n)
    val newRank = new Array[Int](n)
    var k = 1
    var maxRank = -1
    while (maxRank < n - 1 && k < n * 2) {
      i = 0
      while (i < n) {
        val r2 = if (i + k < n) rank(i + k) + 1 else 0
        packed(i) = (rank(i).toLong << 41) | (r2.toLong << 20) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(packed)
      var r = 0
      newRank((packed(0) & 0xfffff).toInt) = 0
      i = 1
      while (i < n) {
        if ((packed(i) >>> 20) != (packed(i - 1) >>> 20)) r += 1
        newRank((packed(i) & 0xfffff).toInt) = r
        i += 1
      }
      System.arraycopy(newRank, 0, rank, 0, n)
      maxRank = r
      k <<= 1
    }
    val sa = new Array[Int](n)
    i = 0
    while (i < n) { sa(i) = (packed(i) & 0xfffff).toInt; i += 1 }
    sa
  }

  /** Compare suffix s[off..] against probe `p` treating a full prefix
    * match as equality: 0 iff p is a prefix of the suffix.
    */
  private def cmpSuffixVsProbe(s: String, off: Int, p: String): Int = {
    val n = s.length
    val m = p.length
    var i = 0
    while (i < m) {
      if (off + i >= n) return -1 // suffix exhausted first => suffix < p
      val c = s.charAt(off + i) - p.charAt(i)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** True iff `p` occurs in `s` (whose suffix array `sa` was built by
    * [[build]]). Empty probe is trivially contained.
    */
  def containsSub(s: String, sa: Array[Int], p: String): Boolean = {
    if (p.isEmpty) return true
    var lo = 0
    var hi = sa.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = cmpSuffixVsProbe(s, sa(mid), p)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }
}
