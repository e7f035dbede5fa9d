package graft.sources

/** PDF Standard Security Handler — all three generations: V=2 R=3
  * (RC4-128, PDF 32000-1:2008 §7.6.3), V=4 (/AESV2 crypt filters), and
  * V=5 R=6 (/AESV3 AES-256, ISO 32000-2 §7.6.4). This is FORMAT support
  * on the decryption side (a pipeline must READ such files; the
  * reference gets it free from fitz, data_ingestion.py:116-122) —
  * RC4/MD5 here are the format's required primitives, long obsolete as
  * cryptography; the R6 layer is SHA-2/AES-256.
  *
  * Implemented algorithms (spec numbering): 2 (file key from the padded
  * password, 50-fold MD5 strengthening), 3 (/O owner value), 5 (/U
  * verification value, R3 form), 1 (per-object key: MD5 of file key +
  * 3 LE object-number bytes + 2 LE generation bytes). Only the empty
  * user/owner password path is wired — the overwhelmingly common case
  * for crawl-encountered encrypted PDFs (encryption-for-permissions,
  * not secrecy). */
object PdfCrypto {

  /** The spec's 32-byte padding string (Table 24 context, §7.6.3.3). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** 128-bit file keys (/Length 128, n = 16). */
  val KeyLen = 16

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (the format primitive). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def pLe(p: Int): Array[Byte] = Array(
    (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
    ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)

  private def strengthen(h0: Array[Byte]): Array[Byte] = {
    var h = h0
    var i = 0
    while (i < 50) { h = md5(h.take(KeyLen)); i += 1 }
    h
  }

  private def xorKey(key: Array[Byte], i: Int): Array[Byte] =
    key.map(b => (b ^ i).toByte)

  /** Algorithm 3: the /O entry, empty owner AND user passwords. */
  def computeO(): Array[Byte] = {
    val key = strengthen(md5(Pad)).take(KeyLen)
    var o = rc4(key, Pad)
    var i = 1
    while (i <= 19) { o = rc4(xorKey(key, i), o); i += 1 }
    o
  }

  /** Algorithm 2: the file encryption key for the EMPTY user password. */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte]): Array[Byte] =
    strengthen(md5(Pad, o, pLe(p), id0)).take(KeyLen)

  /** Algorithm 5 (R3): the /U entry — 16 verification bytes + 16 bytes
    * of padding (arbitrary per spec; zeros here). */
  def computeU(key: Array[Byte], id0: Array[Byte]): Array[Byte] = {
    var u = rc4(key, md5(Pad, id0))
    var i = 1
    while (i <= 19) { u = rc4(xorKey(key, i), u); i += 1 }
    u ++ new Array[Byte](16)
  }

  /** Algorithm 1: the per-object key (min(n+5, 16) bytes). For AESV2
    * (V=4 crypt filters) the spec appends the constant salt "sAlT"
    * before hashing. */
  def objKey(key: Array[Byte], objNum: Int, gen: Int,
      aes: Boolean = false): Array[Byte] = {
    val extra = Array(
      (objNum & 0xFF).toByte, ((objNum >> 8) & 0xFF).toByte,
      ((objNum >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
    val salted = if (aes) extra ++ Array[Byte](0x73, 0x41, 0x6C, 0x54) else extra
    md5(key, salted).take(math.min(KeyLen + 5, 16))
  }

  /** AESV2 stream encryption: 16-byte IV prepended to AES-128-CBC
    * ciphertext with PKCS#5 padding (PDF 1.7 §7.6.2). */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** AESV2 decryption; None on malformed input (short/bad padding). */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] =
    try {
      if (data.length < 32) None
      else {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        Some(c.doFinal(data, 16, data.length - 16))
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------ AES-256 (V=5, R=6)
  // ISO 32000-2 §7.6.4 — the current encryption generation (PDF 2.0,
  // also emitted by Acrobat X+ as "AES-256"). Unlike V<=4 there is NO
  // per-object key: strings and streams encrypt directly under the
  // 32-byte file key; the password layer wraps that key via /UE (user)
  // and /OE (owner) using the SHA-2 family hash below.

  def sha2(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** AES-CBC without padding (the R6 key-wrap primitive; data is always
    * block-aligned). 32-byte key => AES-256, 16-byte => AES-128. */
  def aesCbcNoPad(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
           else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B (§7.6.4.3.4): the R6 password hash. Iterated
    * SHA-256/384/512 selected by the AES output mod 3 — the first 16
    * encrypted bytes as a big-endian integer mod 3 equals their byte sum
    * mod 3 (256 ≡ 1 mod 3), which is how every implementation computes
    * it. At least 64 rounds; stops when the last encrypted byte is <=
    * round - 32. `udata` is empty for the user-password hash and the
    * full 48-byte /U value for the owner-password hash. */
  def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha2("SHA-256", password, salt, udata)
    var round = 0
    var done = false
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1
      }
      val e = aesCbcNoPad(k.take(16), k.slice(16, 32), k1, encrypt = true)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xFF; i += 1 }
      k = (sum % 3) match {
        case 0 => sha2("SHA-256", e)
        case 1 => sha2("SHA-384", e)
        case _ => sha2("SHA-512", e)
      }
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xFF) <= round - 32) done = true
    }
    k.take(32)
  }

  /** Recover the 32-byte file key from /U + /UE for the EMPTY user
    * password (the crawl case, same policy as the V<=4 path): verify the
    * /U hash against its validation salt, then unwrap /UE under the
    * intermediate key from the key salt (zero IV per spec). None on a
    * passworded file — extract-empty, never garbage. */
  def fileKeyR6(u: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] =
    try {
      if (u.length < 48 || ue.length < 32) None
      else {
        val vs = java.util.Arrays.copyOfRange(u, 32, 40)
        val ks = java.util.Arrays.copyOfRange(u, 40, 48)
        val empty = Array.emptyByteArray
        if (!java.util.Arrays.equals(hash2B(empty, vs, empty), u.take(32))) None
        else Some(aesCbcNoPad(hash2B(empty, ks, empty),
          new Array[Byte](16), ue.take(32), encrypt = false))
      }
    } catch { case _: Exception => None }

  def toHex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
  def fromHex(h: String): Array[Byte] = {
    val p = if (h.length % 2 == 1) h + "0" else h
    p.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
