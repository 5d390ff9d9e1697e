package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Fernet-layer parity (`lwetl/security.py`): the JDK implementation
  * must interoperate with the Python `cryptography` library BOTH ways —
  * tokens we mint decrypt there, tokens minted there decrypt here —
  * and the reference's framing (init_key padding, length frame, double
  * base64) must round-trip its own doc-test phrases. */
class SecuritySpec extends AnyFunSuite {

  private def python(script: String): String = {
    val f = java.nio.file.Files.createTempFile("sec", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    import scala.sys.process._
    val out = new StringBuilder
    val code = Seq("python3", f.toString) ! ProcessLogger(out ++= _ += '\n', out ++= _ += '\n')
    assert(code == 0, s"python script failed:\n$out")
    out.toString.trim
  }

  test("init_key pads with the running length and truncates at 32") {
    val k = Security.initKey("abc")
    assert(k.length == 32)
    assert(k.take(3).toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(k(3) == 3.toByte && k(4) == 4.toByte && k(31) == 31.toByte)
    assert(Security.initKey("x" * 40).toSeq == ("x" * 32).getBytes("UTF-8").toSeq)
    // reference doc-test passphrase is multi-byte UTF-8
    assert(Security.initKey("èç@£AB34adc").length == 32)
  }

  test("reference doc-test phrases round-trip (security.py:108-118)") {
    for (phrase <- Seq("çur@tor€=12B", "abc")) {
      val enc = Security.encrypt(phrase, "èç@£AB34adc")
      assert(Security.decrypt(enc, "èç@£AB34adc") == phrase)
      // two encryptions differ (random IV + filler) but both decrypt
      val enc2 = Security.encrypt(phrase, "èç@£AB34adc")
      assert(enc != enc2)
      assert(Security.decrypt(enc2, "èç@£AB34adc") == phrase)
    }
  }

  test("wrong key fails HMAC, not garbage output") {
    val enc = Security.encrypt("secret", "right-password")
    intercept[Security.DecryptionError] {
      Security.decrypt(enc, "wrong-password")
    }
  }

  test("python cryptography decrypts our tokens (JDK → pyca)") {
    val key32 = Security.initKey("interop-test-key")
    val token = Security.fernetEncrypt("hello from the JVM".getBytes("UTF-8"), key32)
    val keyB64 = java.util.Base64.getUrlEncoder.encodeToString(key32)
    val got = python(
      s"""from cryptography.fernet import Fernet
         |print(Fernet(b'$keyB64').decrypt(b'$token').decode())""".stripMargin)
    assert(got == "hello from the JVM")
  }

  test("we decrypt python cryptography tokens (pyca → JDK)") {
    val key32 = Security.initKey("interop-test-key")
    val keyB64 = java.util.Base64.getUrlEncoder.encodeToString(key32)
    val token = python(
      s"""from cryptography.fernet import Fernet
         |print(Fernet(b'$keyB64').encrypt('hello from python'.encode()).decode())""".stripMargin)
    val got = new String(Security.fernetDecrypt(token, key32), "UTF-8")
    assert(got == "hello from python")
  }

  test("full reference format interops: python-made lwetl token decrypts here") {
    // mirror security.py's encrypt() in python on top of pyca Fernet,
    // then decrypt with the Scala reference-format decrypt
    val token = python(
      """import base64, random
        |from cryptography.fernet import Fernet
        |k = bytearray('graft-master-pw'.encode())
        |while len(k) < 32: k.append(len(k))
        |key = base64.urlsafe_b64encode(bytes(k))
        |s = 'çur@tor€=12B'
        |s2 = '{:02x}{}'.format(128 + len(s), s)
        |while len(s2) < 132: s2 += chr(random.randint(33, 126))
        |print(base64.urlsafe_b64encode(Fernet(key).encrypt(s2.encode())).decode())
        |""".stripMargin)
    assert(Security.decrypt(token, "graft-master-pw") == "çur@tor€=12B")
    // and the reverse: our token decrypts through the python mirror
    val ours = Security.encrypt("çur@tor€=12B", "graft-master-pw")
    // print base64 of the utf-8 bytes: the JVM decodes subprocess stdout
    // with the C-locale charset, which would mangle the raw phrase
    val back = python(
      s"""import base64
         |from cryptography.fernet import Fernet
         |k = bytearray('graft-master-pw'.encode())
         |while len(k) < 32: k.append(len(k))
         |key = base64.urlsafe_b64encode(bytes(k))
         |s2 = Fernet(key).decrypt(base64.urlsafe_b64decode('$ours'.encode())).decode()
         |out = s2[2:2 + int(s2[0:2], 16) - 128]
         |print(base64.b64encode(out.encode()).decode())""".stripMargin)
    assert(new String(java.util.Base64.getDecoder.decode(back), "UTF-8") == "çur@tor€=12B")
  }

  test("property: encrypt/decrypt round-trips arbitrary phrases and keys (300 random)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val phraseGen = for {
      n <- Gen.choose(0, 127)
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('ç', '€', '@', '/', ' ', '\'', '"', '平', 'Ж')))
    } yield cs.mkString
    val keyGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))
    var seed = Seed(42L)
    (1 to 300).foreach { i =>
      val phrase = phraseGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val key = keyGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val enc = Security.encrypt(phrase, key)
      assert(Security.decrypt(enc, key) == phrase, s"iteration $i key=$key phrase=$phrase")
    }
  }

  test("property: alias dump/parse round-trips arbitrary credentials (500 random)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // credentials drawn from a hostile alphabet: quotes, hashes, spaces
    // (inner), colons, unicode — anything the YAML subset must not eat
    val credGen = for {
      n <- Gen.choose(1, 30)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar,
        3 -> Gen.oneOf('#', '\'', '"', '@', '/', ':', '.', '-', '_', ' ', 'é', '€')))
    } yield cs.mkString.trim
    var seed = Seed(7L)
    var checked = 0
    (1 to 500).foreach { _ =>
      val v = credGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      if (v.nonEmpty) {
        checked += 1
        val cfg = Config.Conf(aliases = Map("a" -> v), encrypt = Some(false))
        val back = Config.parseYaml(Config.dumpYaml(cfg)).aliases.get("a")
        assert(back.contains(v), s"round trip lost [${v}] -> $back")
      }
    }
    assert(checked > 400)
  }

  test("keyring stub stores, retrieves, deletes") {
    val u = "spec-user-" + System.nanoTime()
    assert(Security.Keyring.get(u).isEmpty)
    Security.Keyring.set(u, "kr-secret")
    assert(Security.Keyring.get(u).contains("kr-secret"))
    assert(Security.Keyring.delete(u))
    assert(Security.Keyring.get(u).isEmpty)
    assert(!Security.Keyring.delete(u))
  }

  test("keyring chain: writes hit the first AVAILABLE backend, reads fall through") {
    /** Scripted backend: availability/write-acceptance fixed, calls
      * recorded. */
    class Fake(val name: String, val available: Boolean,
               seed: Map[String, String] = Map.empty,
               acceptsWrites: Boolean = true)
      extends Security.Keyring.Backend {
      val store = scala.collection.mutable.Map[String, String](seed.toSeq: _*)
      var sets, gets, deletes = 0
      def get(user: String): Option[String] = { gets += 1; store.get(user) }
      def set(user: String, password: String): Boolean = {
        sets += 1
        if (acceptsWrites) { store(user) = password; true } else false
      }
      def delete(user: String): Boolean = { deletes += 1; store.remove(user).isDefined }
    }
    val daemon = new Fake("daemon", available = true)
    val off = new Fake("off", available = false, seed = Map("u" -> "NEVER"))
    val file = new Fake("file", available = true, seed = Map("old" -> "filed"))
    val orig = Security.Keyring.backends
    Security.Keyring.backends = Seq(off, daemon, file)
    try {
      // write: lands on the first AVAILABLE backend; the unavailable one
      // and the weaker one are untouched
      Security.Keyring.set("u", "pw")
      assert(daemon.store.get("u").contains("pw") && daemon.sets == 1)
      assert(file.sets == 0 && off.sets == 0)
      // read: preference order — the daemon copy shadows any file copy
      file.store("u") = "stale"
      assert(Security.Keyring.get("u").contains("pw"))
      // read falls THROUGH to the file store when earlier backends miss
      assert(Security.Keyring.get("old").contains("filed"))
      assert(off.gets == 0, "unavailable backends must never be consulted")
      // delete: clears EVERY available backend (no resurrection from the
      // weaker store on the next fallback read)
      assert(Security.Keyring.delete("u"))
      assert(daemon.store.get("u").isEmpty && file.store.get("u").isEmpty)
      assert(Security.Keyring.get("u").isEmpty)
    } finally Security.Keyring.backends = orig
  }

  test("keyring chain: a write REFUSED upstream falls through, never vanishes") {
    // the real-world shape: secret-tool binary on PATH but no
    // SecretService daemon — store exits nonzero; the secret must land
    // in the next backend instead of being dropped on the floor
    class Fake2(n: String, ok: Boolean) extends Security.Keyring.Backend {
      val store = scala.collection.mutable.Map[String, String]()
      val name = n; val available = true
      def get(user: String): Option[String] = store.get(user)
      def set(user: String, password: String): Boolean = {
        if (ok) store(user) = password; ok
      }
      def delete(user: String): Boolean = store.remove(user).isDefined
    }
    val daemonless = new Fake2("daemonless", ok = false)
    val file = new Fake2("file", ok = true)
    val orig = Security.Keyring.backends
    Security.Keyring.backends = Seq(daemonless, file)
    try {
      Security.Keyring.set("u", "pw")
      assert(file.store.get("u").contains("pw"),
        "refused write must fall through to the file backend")
      assert(Security.Keyring.get("u").contains("pw"))
    } finally Security.Keyring.backends = orig
  }

  test("keyring chain in THIS container resolves to the file backend") {
    // no keyring daemon in the sandbox: secret-tool must report itself
    // unavailable (not error) and real traffic lands in the 0600 file
    assert(!Security.Keyring.SecretToolBackend.available ||
      Security.Keyring.SecretToolBackend.get("graft-absent-user").isEmpty)
    assert(Security.Keyring.FileBackend.available)
  }

  test("resolveKey order: explicit > env > keyring") {
    assert(Security.resolveKey(Some("xx"), Map("LWETL" -> "env")) == Some("xx"))
    assert(Security.resolveKey(None, Map("LWETL" -> "env")) == Some("env"))
    assert(Security.resolveKey(Some("  "), Map("LWETL" -> "env")) == Some("env"))
  }

  test("encrypted password resolves through parseLogin (Config.decrypt wiring)") {
    val enc = Security.encrypt("s3cret", "master")
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("db1" -> Config.Server("derby", "/tmp/db1")),
      aliases = Map("prod" -> s"scott/$enc@db1"))
    Security.install("master")
    try {
      val r = Config.parseLogin(cfg, "prod")
      assert(r.user.contains("scott"))
      assert(r.password.contains("s3cret"))
    } finally Security.uninstall()
  }

  test("passwords containing '#' and quotes survive the dump/parse round trip") {
    val cfg = Config.Conf(
      servers = Map("db1" -> Config.Server("derby", "/tmp/db1")),
      aliases = Map(
        "hash" -> "scott/p#55@db1",          // '#' is data, not a comment
        "quoted" -> "scott/it's#2@db1"),
      encrypt = Some(false))
    val redumped = Config.parseYaml(Config.dumpYaml(cfg))
    assert(redumped.aliases("hash") == "scott/p#55@db1")
    assert(redumped.aliases("quoted") == "scott/it's#2@db1")
    // a REAL comment (whitespace before '#') still strips
    val parsed = Config.parseYaml("alias:\n  a: scott/pw@db1  # prod creds\n")
    assert(parsed.aliases("a") == "scott/pw@db1")
    // a mid-scalar apostrophe is plain data — the later comment strips
    val apostrophe = Config.parseYaml("alias:\n  a: scott/it's-pw@db1  # prod\n")
    assert(apostrophe.aliases("a") == "scott/it's-pw@db1")
    // password containing a quote AND ' #' survives via '' escaping
    val nasty = Config.Conf(aliases = Map("n" -> "u/p' #x@db1"),
      encrypt = Some(false))
    assert(Config.parseYaml(Config.dumpYaml(nasty)).aliases("n") == "u/p' #x@db1")
  }

  test("keyring file is written owner-only") {
    val u = "perm-user-" + System.nanoTime()
    Security.Keyring.set(u, "secret")
    try {
      val f = java.nio.file.Paths.get(
        sys.props("user.home"), ".graft", "keyring.properties")
      val perms = java.nio.file.Files.getPosixFilePermissions(f)
      import java.nio.file.attribute.PosixFilePermission._
      assert(!perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ),
        s"keyring must not be group/world readable: $perms")
    } finally Security.Keyring.delete(u)
  }

  test("config file with encrypt flag parses and dumps") {
    val yaml =
      """encrypt: false
        |servers:
        |  db1:
        |    type: derby
        |    url: '/tmp/db1'
        |alias:
        |  prod: scott/tiger@db1
        |""".stripMargin
    val cfg = Config.parseYaml(yaml)
    assert(cfg.encrypt.contains(false))
    assert(!cfg.pwEncrypted)
    assert(Config.parseYaml("servers:\n  a:\n    type: derby\n    url: x\n").pwEncrypted,
      "encrypt defaults TRUE like the reference")
    val redumped = Config.parseYaml(Config.dumpYaml(cfg))
    assert(redumped == cfg)
  }

  test("security CLI end-to-end: set → encrypted file → remove → plaintext") {
    val dir = java.nio.file.Files.createTempDirectory("graftsec")
    val cfgFile = dir.resolve("config.yml")
    java.nio.file.Files.write(cfgFile,
      """encrypt: false
        |drivers:
        |  derby:
        |    url: 'jdbc:derby:'
        |servers:
        |  db1:
        |    type: derby
        |    url: '/tmp/db1'
        |alias:
        |  prod: scott/tiger@db1
        |""".stripMargin.getBytes("UTF-8"))
    val encFile = dir.resolve("enc.yml").toString
    val plainFile = dir.resolve("plain.yml").toString

    // `set` rewrites with encrypted passwords (LWETL env resolves via
    // resolveKey; SecurityMain reads sys.env, so stage through keyring)
    val user = sys.props.getOrElse("user.name", "graft")
    Security.Keyring.set(user, "master-pw")
    try {
      graft.apps.SecurityMain.main(
        Array("set", cfgFile.toString, "-o", encFile))
      val enc = Config.loadLayered(Seq(encFile))
      assert(enc.encrypt.contains(true))
      val cred = enc.aliases("prod")
      assert(cred.startsWith("scott/") && cred.endsWith("@db1") && !cred.contains("tiger"))

      // the encrypted file resolves through parseLogin once installed
      Security.install("master-pw")
      try {
        val r = Config.parseLogin(enc, "prod")
        assert(r.password.contains("tiger"))
      } finally Security.uninstall()

      // `remove` restores plaintext
      graft.apps.SecurityMain.main(Array("remove", encFile, "-o", plainFile))
      val plain = Config.loadLayered(Seq(plainFile))
      assert(plain.encrypt.contains(false))
      assert(plain.aliases("prod") == "scott/tiger@db1")
    } finally Security.Keyring.delete(user)
  }

  test("security CLI test command: probes live connections per alias") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftsectest")
    // create the database up front so the probe connects without ;create
    java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/db;create=true").close()
    val dir = java.nio.file.Files.createTempDirectory("graftseccfg")
    val cfgFile = dir.resolve("config.yml")
    java.nio.file.Files.write(cfgFile,
      s"""encrypt: false
         |drivers:
         |  derby:
         |    url: 'jdbc:derby:'
         |servers:
         |  live:
         |    type: derby
         |    url: '$dbDir/db'
         |  dead:
         |    type: derby
         |    url: '/no/such/dir/db'
         |alias:
         |  good: app/pw@live
         |  bad: app/pw@dead
         |""".stripMargin.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.apps.SecurityMain.main(Array("test", cfgFile.toString))
    }
    val lines = out.toString("UTF-8")
    assert(lines.linesIterator.exists(l => l.contains("good") && l.contains("OK")),
      s"live alias must probe OK:\n$lines")
    assert(lines.linesIterator.exists(l => l.contains("bad") && l.contains("Failed")),
      s"dead alias must report failure:\n$lines")
  }

  test("security CLI rewrite: set encrypts aliases, remove restores plaintext") {
    val cfg = Config.Conf(
      servers = Map("db1" -> Config.Server("derby", "/tmp/db1")),
      aliases = Map("prod" -> "scott/tiger@db1", "weird" -> "not-a-credential"),
      encrypt = Some(false))
    val enc = SecurityMainAccess.rewrite(cfg, p => Security.encrypt(p, "m"))
    val cred = enc.aliases("prod")
    assert(cred.startsWith("scott/") && cred.endsWith("@db1") && !cred.contains("tiger"))
    assert(enc.aliases("weird") == "not-a-credential", "unparseable aliases pass through")
    val dec = SecurityMainAccess.rewrite(enc, p => Security.decrypt(p, "m"))
    assert(dec.aliases("prod") == "scott/tiger@db1")
  }
}

/** Bridge to the apps package without importing it at top level. */
private object SecurityMainAccess {
  def rewrite(cfg: Config.Conf, f: String => String): Config.Conf =
    graft.apps.SecurityMain.rewriteAliases(cfg, f)
}
