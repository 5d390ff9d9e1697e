package graft.io

import java.security.MessageDigest
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

/** Password encryption (`lwetl/security.py:22-105`) — a JDK-only
  * implementation of the public Fernet token format
  * (github.com/fernet/spec: version 0x80 | 64-bit BE timestamp |
  * 16-byte IV | AES-128-CBC/PKCS7 ciphertext | HMAC-SHA256 over all
  * preceding bytes; the 32-byte key splits into signing[0:16] and
  * encryption[16:32] halves, base64url encoded).
  *
  * On top of the raw token the reference adds its own framing
  * (`security.py:70-105`):
  *   - the key string is padded/truncated to 32 bytes, appending the
  *     byte value of the current length until full (`init_key`)
  *   - the plaintext is framed "%02x"%(128+len) + text, padded to 132
  *     CHARS with random printable filler (`encrypt`)
  *   - the Fernet token (itself base64url text) is base64url encoded a
  *     second time (`encrypt` return)
  * Both layers round-trip against the Python `cryptography` library in
  * `SecuritySpec`.
  */
object Security {

  private val B64 = java.util.Base64.getUrlEncoder
  private val B64D = java.util.Base64.getUrlDecoder

  /** `init_key` (`security.py:22-38`): pad/truncate the passphrase to
    * exactly 32 bytes; each padding byte is the length at the time it
    * is appended. */
  def initKey(passphrase: String): Array[Byte] = {
    val raw = passphrase.getBytes("UTF-8")
    if (raw.length == 32) raw
    else if (raw.length > 32) raw.take(32)
    else {
      val buf = scala.collection.mutable.ArrayBuffer(raw.toIndexedSeq: _*)
      while (buf.length < 32) buf += buf.length.toByte
      buf.toArray
    }
  }

  class DecryptionError(msg: String) extends RuntimeException(msg)

  /** Raw Fernet encrypt: plaintext bytes → token text. Timestamp and IV
    * are injectable for deterministic tests. */
  def fernetEncrypt(plain: Array[Byte], key32: Array[Byte],
                    timestampSec: Long = System.currentTimeMillis() / 1000,
                    ivOpt: Option[Array[Byte]] = None): String = {
    require(key32.length == 32, "Fernet key must be 32 bytes")
    val iv = ivOpt.getOrElse {
      val b = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(b)
      b
    }
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(key32.drop(16), "AES"), new IvParameterSpec(iv))
    val ct = cipher.doFinal(plain)
    val body = java.nio.ByteBuffer.allocate(1 + 8 + 16 + ct.length)
      .put(0x80.toByte).putLong(timestampSec).put(iv).put(ct).array()
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key32.take(16), "HmacSHA256"))
    B64.encodeToString(body ++ mac.doFinal(body))
  }

  /** Raw Fernet decrypt + HMAC verify: token text → plaintext bytes. */
  def fernetDecrypt(token: String, key32: Array[Byte]): Array[Byte] = {
    require(key32.length == 32, "Fernet key must be 32 bytes")
    val all =
      try B64D.decode(token)
      catch { case e: IllegalArgumentException => throw new DecryptionError(e.getMessage) }
    if (all.length < 1 + 8 + 16 + 32 || all(0) != 0x80.toByte)
      throw new DecryptionError("malformed Fernet token")
    val (body, sig) = all.splitAt(all.length - 32)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key32.take(16), "HmacSHA256"))
    if (!MessageDigest.isEqual(mac.doFinal(body), sig))
      throw new DecryptionError("HMAC verification failed — wrong key?")
    val iv = body.slice(9, 25)
    val cipher = Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(key32.drop(16), "AES"), new IvParameterSpec(iv))
    try cipher.doFinal(body.drop(25))
    catch { case e: java.security.GeneralSecurityException =>
      throw new DecryptionError(s"cannot decrypt: ${e.getMessage}") }
  }

  /** `encrypt` (`security.py:70-88`): length-framed, filler-padded,
    * Fernet-encrypted, then base64url once more. */
  def encrypt(s: String, passphrase: String): String = {
    if (s.length > 127) throw new IllegalArgumentException("String too long for encryption.")
    val rnd = new scala.util.Random()
    val framed = new StringBuilder(f"${128 + s.length}%02x$s")
    while (framed.length < 132) framed += (33 + rnd.nextInt(94)).toChar
    val token = fernetEncrypt(framed.toString.getBytes("UTF-8"), initKey(passphrase))
    B64.encodeToString(token.getBytes("UTF-8"))
  }

  /** `decrypt` (`security.py:91-105`): undo the outer base64, Fernet
    * decrypt, then cut the frame: first two hex chars give 128+len. */
  def decrypt(s: String, passphrase: String): String = {
    val token =
      try new String(B64D.decode(s), "UTF-8")
      catch { case e: IllegalArgumentException => throw new DecryptionError(e.getMessage) }
    val framed = new String(fernetDecrypt(token, initKey(passphrase)), "UTF-8")
    val n = Integer.parseInt(framed.substring(0, 2), 16) - 128
    framed.substring(2, 2 + n)
  }

  // ------------------------------------------------- key resolution

  /** Keyring (`security.py:41-67` get_key; the reference delegates to
    * the python `keyring` library, whose Linux chain is SecretService →
    * encrypted file): a FALLBACK CHAIN of backends tried in order —
    * the OS keyring first (via the libsecret `secret-tool` CLI, when one
    * is on PATH — the JDK has no SecretService binding), then a
    * permission-restricted (0600) properties file, which is what a
    * headless container without a keyring daemon ends up using. Reads
    * fall through the chain; writes/deletes go to the FIRST available
    * backend so a secret never silently lands in a weaker store while a
    * stronger one is present. */
  object Keyring {

    /** One password store in the chain — same service+user→password
      * contract as the reference's keyring calls. */
    private[graft] trait Backend {
      def name: String
      def available: Boolean
      def get(user: String): Option[String]
      /** true iff the secret was actually stored — a backend whose
        * binary exists but whose daemon is absent must answer false so
        * the chain can fall through instead of losing the secret. */
      def set(user: String, password: String): Boolean
      def delete(user: String): Boolean
    }

    /** libsecret's CLI (`secret-tool lookup/store/clear`) — the same
      * SecretService daemon python-keyring talks to, reached through
      * ProcessBuilder because no JVM binding ships offline. Absent
      * binary or failed daemon ⇒ not available / None, never an error:
      * the chain's next backend picks it up. */
    private[graft] object SecretToolBackend extends Backend {
      val name = "secret-tool"
      private def exe: Option[String] =
        sys.env.getOrElse("PATH", "").split(':').filter(_.nonEmpty)
          .map(d => new java.io.File(d, "secret-tool"))
          .find(f => f.isFile && f.canExecute).map(_.getAbsolutePath)
      def available: Boolean = exe.isDefined

      /** Run secret-tool; UTF-8 through raw streams (ProcessLogger
        * would mangle non-ASCII under this JVM's ASCII default
        * charset). Returns stdout on exit 0. Bounded: stderr is
        * DISCARDED (an undrained pipe wedges the child past 64 KB) and
        * a 10 s waitFor + destroy keeps a locked-keyring unlock PROMPT
        * from hanging the whole credential-resolution path — a timed-out
        * or failed call is simply "not stored here" and the chain falls
        * through. Secret payloads are one short line, so the child
        * never blocks on an unread stdout buffer while we wait. */
      private def run(args: Seq[String], stdin: Option[String]): Option[String] =
        exe.flatMap { e =>
          try {
            val pb = new ProcessBuilder((e +: args): _*)
            pb.redirectError(ProcessBuilder.Redirect.DISCARD)
            val proc = pb.start()
            stdin.foreach(s => proc.getOutputStream.write(s.getBytes("UTF-8")))
            proc.getOutputStream.close()
            if (!proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
              proc.destroyForcibly()
              None
            } else if (proc.exitValue() == 0)
              Some(new String(proc.getInputStream.readAllBytes(), "UTF-8"))
            else None
          } catch { case _: Exception => None }
        }

      def get(user: String): Option[String] =
        run(Seq("lookup", "service", "lwetl", "username", user), None)
          .map(_.stripLineEnd).filter(_.nonEmpty)
      def set(user: String, password: String): Boolean =
        run(Seq("store", "--label=lwetl credentials", "service", "lwetl",
          "username", user), Some(password)).isDefined
      /** `secret-tool clear` exits 0 whether or not anything matched —
        * probe first so the had-an-entry contract holds. */
      def delete(user: String): Boolean =
        get(user).isDefined &&
          run(Seq("clear", "service", "lwetl", "username", user), None).isDefined
    }

    /** Owner-only properties file — always available, last in the
      * chain. */
    private[graft] object FileBackend extends Backend {
      val name = "file"
      def available: Boolean = true
      def get(user: String): Option[String] = Option(load().getProperty(user))
      def set(user: String, password: String): Boolean =
        try {
          val p = load()
          p.setProperty(user, password)
          store(p)
          true
        } catch { case _: java.io.IOException => false }
      def delete(user: String): Boolean = {
        val p = load()
        val had = p.remove(user) != null
        if (had) store(p)
        had
      }
    }

    /** The chain, strongest first. Mutable so specs can exercise the
      * fallback ORDER with scripted backends. */
    @volatile private[graft] var backends: Seq[Backend] =
      Seq(SecretToolBackend, FileBackend)

    private def file: java.nio.file.Path =
      java.nio.file.Paths.get(sys.props("user.home"), ".graft", "keyring.properties")

    private def load(): java.util.Properties = {
      val p = new java.util.Properties()
      if (java.nio.file.Files.isReadable(file)) {
        val in = java.nio.file.Files.newInputStream(file)
        try p.load(in) finally in.close()
      }
      p
    }

    /** Read falls THROUGH the chain: first backend that has the entry
      * wins (reference chain semantics — a file-stored secret is still
      * found when a keyring daemon appears later). */
    def get(user: String): Option[String] =
      backends.iterator.filter(_.available)
        .map(_.get(user)).collectFirst { case Some(p) => p }

    /** Write goes to the first available backend that ACCEPTS it — a
      * present-but-daemonless secret-tool reports failure and the
      * secret falls through to the file store instead of vanishing. */
    def set(user: String, password: String): Unit =
      backends.filter(_.available).exists(_.set(user, password))

    /** Write owner-only (0700 dir, 0600 file) — the key store must not
      * hand every local user the password that defeats the alias
      * encryption. The file is CREATED with owner-only permissions
      * before any secret byte is written (a chmod after the write
      * would leave a world-readable window under umask 022); non-POSIX
      * filesystems fall back to a plain create. */
    private def store(p: java.util.Properties): Unit = {
      import java.nio.file.attribute.PosixFilePermissions
      java.nio.file.Files.createDirectories(file.getParent)
      scala.util.Try(java.nio.file.Files.setPosixFilePermissions(
        file.getParent, PosixFilePermissions.fromString("rwx------")))
      if (!java.nio.file.Files.exists(file))
        scala.util.Try(java.nio.file.Files.createFile(file,
          PosixFilePermissions.asFileAttribute(
            PosixFilePermissions.fromString("rw-------"))))
      scala.util.Try(java.nio.file.Files.setPosixFilePermissions(
        file, PosixFilePermissions.fromString("rw-------")))
      val out = java.nio.file.Files.newOutputStream(file)
      try p.store(out, "graft keyring file backend") finally out.close()
      ()
    }

    /** Delete from EVERY available backend (a stale copy left in the
      * file store after the daemon copy dies would resurrect the old
      * password on the next fallback read). */
    def delete(user: String): Boolean =
      backends.filter(_.available).map(_.delete(user)).exists(identity)
  }

  /** Master-password resolution order (`security.py:41-67`): explicit
    * argument → LWETL env var → keyring; no interactive prompt in a
    * batch engine (the reference's getpass branch maps to "not found"). */
  def resolveKey(explicit: Option[String] = None,
                 env: Map[String, String] = sys.env): Option[String] =
    explicit.filter(_.trim.nonEmpty)
      .orElse(env.get("LWETL"))
      .orElse(Keyring.get(sys.props.getOrElse("user.name", "graft")))

  /** Wire decryption into [[Config.decrypt]] so `parseLogin` resolves
    * `user/ENCRYPTED@service` credentials transparently. */
  def install(passphrase: String): Unit =
    Config.decrypt = s => decrypt(s, passphrase)

  def uninstall(): Unit = Config.decrypt = identity
}
