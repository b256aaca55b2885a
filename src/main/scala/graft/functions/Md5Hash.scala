package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Single home for the portable 32-bit md5-prefix hash: the unsigned
  * value of the first 8 hex digits of md5(s) — the derivation every
  * constant (MinHash family, LSH sign matrices, SimHash word hashes)
  * and both engines' oracles agree on.
  *
  * Hot path: [[prefix32]] is called once per WORD by the codegen'd
  * SimHash/fingerprint expressions, so it must not allocate a hex
  * string (the original `String.format`-per-byte + `parseLong` chain
  * measured ~20 µs/call and put a map-only scan at 2.5 s for 5 000
  * small docs — §5c-r8c); the first 8 hex digits of a digest ARE its
  * first 4 bytes read big-endian unsigned, so the value comes straight
  * off the byte array. MessageDigest instances are thread-local
  * (`getInstance` per call is allocation + provider lookup). */
object Md5Hash {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def digest(s: String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

  def hex(s: String): String = {
    val bytes = digest(s)
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexChars(b >> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def prefix32(s: String): Long = {
    val b = digest(s)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }
}
