package graft.operators

/** Bailey–Borwein–Plouffe digit-extraction kernel (reference
  * `ex:BaileyBorweinPlouffe.java` — distributed hex digits of π; same
  * embarrassingly-parallel shape as the reference's map-only sum). Each
  * digit position is computed independently from the published BBP
  * identity
  *   π = Σ_k 16^-k (4/(8k+1) − 2/(8k+4) − 1/(8k+5) − 1/(8k+6)),
  * so a row per position distributes with zero coordination. The series
  * code below is an original implementation of the public formula.
  *
  * Double precision bounds the usable range to the first few thousand
  * digits — ample for the kernel (the reference's own default is the
  * first 24 digits in its test).
  */
object Bbp {

  /** 16^e mod m by square-and-multiply (exact in Long for m < 2^31). */
  private[operators] def modPow16(e: Long, m: Long): Long = {
    var result = 1L % m
    var base = 16L % m
    var exp = e
    while (exp > 0) {
      if ((exp & 1L) == 1L) result = result * base % m
      base = base * base % m
      exp >>= 1
    }
    result
  }

  /** Fractional part of Σ_k 16^(d-k)/(8k+j). */
  private def series(d: Long, j: Long): Double = {
    var sum = 0.0
    var k = 0L
    while (k <= d) {
      sum += modPow16(d - k, 8 * k + j).toDouble / (8 * k + j)
      sum -= math.floor(sum)
      k += 1
    }
    var tail = 0.0
    var kk = d + 1
    var term = math.pow(16.0, (d - kk).toDouble) / (8 * kk + j)
    while (term > 1e-17) {
      tail += term
      kk += 1
      term = math.pow(16.0, (d - kk).toDouble) / (8 * kk + j)
    }
    sum + tail
  }

  /** Hex digit of π at 1-based position `pos` after the radix point
    * (pos=1 → '2' of 3.243F6A88…).
    */
  def hexDigitAt(pos: Long): String = {
    require(pos >= 1, s"position must be >= 1, got $pos")
    val d = pos - 1
    val x = 4.0 * series(d, 1) - 2.0 * series(d, 4) - series(d, 5) - series(d, 6)
    val frac = x - math.floor(x)
    "0123456789ABCDEF".charAt((frac * 16.0).toInt).toString
  }
}
