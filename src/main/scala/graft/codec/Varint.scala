package graft.codec

/** Reference-compatible variable-length integer codec
  * (index/DeltaConverter.h:51-211).
  *
  * Layout: the top 3 bits of the first byte give the number of following
  * bytes (0-7); the low 5 bits of the first byte are the most significant
  * bits of the value; following bytes are big-endian. Max encodable value
  * is 2^61 - 1. A 0x00 first byte is the end-of-list sentinel (decode
  * returns 0; a real value 0 also encodes to 0x00 — the reference never
  * stores 0 as a payload because deltas are always >= 1).
  */
object Varint {
  val MaxValue: Long = 0x1FFFFFFFFFFFFFFFL // BytesCheckEight, DeltaConverter.h:73

  private val bounds: Array[Long] = Array(
    0x1FL, 0x1FFFL, 0x1FFFFFL, 0x1FFFFFFFL, 0x1FFFFFFFFFL,
    0x1FFFFFFFFFFFL, 0x1FFFFFFFFFFFFFL, 0x1FFFFFFFFFFFFFFFL)

  /** Number of bytes used to encode `value` (DeltaConverter.h:217-223). */
  def encodedLength(value: Long): Int = {
    require(value >= 0 && value <= MaxValue, s"varint out of range: $value")
    var i = 0
    while (value > bounds(i)) i += 1
    i + 1
  }

  /** Expected total length from a first byte (DeltaConverter.h:78-81). */
  def indicatedLength(firstByte: Byte): Int = 1 + ((firstByte & 0xE0) >>> 5)

  /** Encode `value` into `buf` at `off`; returns the new offset. */
  def encode(buf: Array[Byte], off: Int, value: Long): Int = {
    val len = encodedLength(value)
    val numFollow = len - 1
    // first byte: 3-bit length tag + top 5 bits of the value
    buf(off) = ((numFollow << 5) | ((value >>> (numFollow * 8)) & 0x1F)).toByte
    var i = 0
    while (i < numFollow) {
      buf(off + 1 + i) = ((value >>> ((numFollow - 1 - i) * 8)) & 0xFF).toByte
      i += 1
    }
    off + len
  }

  /** Growable primitive byte sink (ArrayBuffer[Byte] boxes every byte —
    * measurably hot in the encode path).
    */
  final class ByteBuilder(initial: Int = 64) {
    private var buf = new Array[Byte](math.max(initial, 16))
    private var len = 0
    def length: Int = len
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def append(value: Long): Unit = {
      ensure(9)
      len = Varint.encode(buf, len, value)
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Decode the value at `off`. Returns (value, newOffset). A 0x00 first
    * byte yields (0, off + 1) — the sentinel (DeltaConverter.h:190-196).
    */
  def decode(buf: Array[Byte], off: Int): (Long, Int) = {
    val first = buf(off)
    if (first == 0) return (0L, off + 1)
    val numFollow = (first & 0xE0) >>> 5
    var result: Long = (first & 0x1F).toLong
    var i = 0
    while (i < numFollow) {
      result = (result << 8) | (buf(off + 1 + i) & 0xFFL)
      i += 1
    }
    (result, off + 1 + numFollow)
  }

  /** Mutable cursor for sequential decoding without tuple allocation. */
  final class Reader(buf: Array[Byte], var off: Int = 0) {
    def hasNext: Boolean = off < buf.length
    def read(): Long = {
      val first = buf(off)
      if (first == 0) { off += 1; return 0L }
      val numFollow = (first & 0xE0) >>> 5
      var result: Long = (first & 0x1F).toLong
      var i = off + 1
      val end = off + 1 + numFollow
      while (i < end) { result = (result << 8) | (buf(i) & 0xFFL); i += 1 }
      off = end
      result
    }
  }
}
