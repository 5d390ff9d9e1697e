package graft.apps

import graft.io.{Config, Security}

/** `graft-security <set|remove|test|delete-keyring> [configFile]
  * [-o out] [-n]` — the reference's `lwetl-security` CLI
  * (`lwetl/programs/lwetl_security/main.py`): rewrites the alias
  * passwords of the layered config encrypted (`set`) or plaintext
  * (`remove`), probes every alias (`test`), or clears the stored master
  * password (`delete-keyring`). `-n` takes the master password from the
  * LWETL environment variable instead of prompting (a batch engine
  * never prompts; without `-n` the key still resolves env → keyring). */
object SecurityMain {

  case class Credentials(user: String, password: String, server: String)

  /** `parse_credentials` (`main.py:52-64`): split `user/pass@server`;
    * anything else passes through unparsed. */
  def parseCredentials(s: String): Either[String, Credentials] = {
    val at = s.lastIndexOf('@')
    if (at < 0) return Left(s)
    val up = s.substring(0, at)
    val slash = up.lastIndexOf('/')
    if (slash < 0) Left(s)
    else Right(Credentials(up.substring(0, slash), up.substring(slash + 1),
      s.substring(at + 1)))
  }

  /** Rewrite every parseable alias with `f(password)` — the
    * encrypt/plaintext rewrite loop (`main.py:154-162`). */
  def rewriteAliases(cfg: Config.Conf, f: String => String): Config.Conf =
    cfg.copy(aliases = cfg.aliases.map { case (name, cred) =>
      name -> (parseCredentials(cred) match {
        case Right(c) => s"${c.user}/${f(c.password)}@${c.server}"
        case Left(raw) => raw
      })
    })

  def main(args: Array[String]): Unit = {
    val command = args.headOption.getOrElse {
      System.err.println("usage: graft-security <set|remove|test|delete-keyring> [file] [-o out] [-n]")
      sys.exit(1)
    }
    val flags = args.drop(1)
    val outFile = flags.sliding(2).collectFirst { case Array("-o", f) => f }
    val file = flags.filterNot(_.startsWith("-"))
      .filterNot(f => flags.sliding(2).exists { case Array("-o", x) => x == f; case _ => false })
      .headOption

    val cfg = file match {
      case Some(f) => Config.loadLayered(Seq(f))
      case None => Config.loadLayered(Config.configFiles())
    }
    if (cfg.aliases.isEmpty && command != "delete-keyring")
      System.err.println("WARNING: no aliases found in configuration")

    val user = sys.props.getOrElse("user.name", "graft")
    command match {
      case "delete-keyring" =>
        val had = Security.Keyring.delete(user)
        println(if (had) s"Deleted keyring password for $user"
                else s"No keyring password found for $user")

      case "test" =>
        // connection probe per alias (`main.py:113-127`): resolve the
        // login, then open a live JDBC connection where a driver
        // exists. The decrypt hook is global state — restore it after
        // the loop so an in-process caller's later plaintext logins
        // don't get routed through decryption.
        val priorDecrypt = Config.decrypt
        try {
          installDecryption(cfg)
          cfg.aliases.keys.toSeq.sorted.zipWithIndex.foreach { case (a, i) =>
            val r = scala.util.Try {
              val resolved = Config.parseLogin(cfg, a)
              val props = new java.util.Properties()
              resolved.user.foreach(props.setProperty("user", _))
              resolved.password.foreach(props.setProperty("password", _))
              val conn = java.sql.DriverManager.getConnection(resolved.url, props)
              conn.close()
              "OK"
            }.recover { case e => s"Failed: ${e.getMessage}" }.get
            println(f"${i + 1}%3d/${cfg.aliases.size}. $a%-30s $r")
          }
        } finally Config.decrypt = priorDecrypt

      case "set" | "remove" =>
        val key = Security.resolveKey().getOrElse {
          System.err.println("ERROR: no master password (set LWETL or the keyring)")
          sys.exit(1)
        }
        // decrypt the current passwords first when the file says they
        // are encrypted (`main.py:109-117`)
        val plain =
          if (cfg.pwEncrypted) rewriteAliases(cfg, p =>
            scala.util.Try(Security.decrypt(p, key)).getOrElse {
              System.err.println(s"WARNING: failed to decrypt a password")
              p
            })
          else cfg
        val rewritten =
          if (command == "set")
            rewriteAliases(plain, p => Security.encrypt(p, key))
              .copy(encrypt = Some(true))
          else plain.copy(encrypt = Some(false))
        val yaml = Config.dumpYaml(rewritten)
        outFile match {
          case Some(f) =>
            java.nio.file.Files.write(java.nio.file.Paths.get(f), yaml.getBytes("UTF-8"))
            println(s"Configuration written to: $f")
          case None => println(yaml)
        }

      case other =>
        System.err.println(s"ERROR: unsupported command: $other")
        sys.exit(1)
    }
  }

  /** Point the global decrypt hook at the master key when the config
    * says its passwords are encrypted (caller restores the prior hook). */
  private def installDecryption(cfg: Config.Conf): Unit =
    Security.resolveKey() match {
      case Some(k) if cfg.pwEncrypted => Security.install(k)
      case _ => Security.uninstall()
    }
}
