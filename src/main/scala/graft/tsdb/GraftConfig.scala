package graft.tsdb

import org.apache.hadoop.conf.Configuration

/** The reference's remote-store configuration file
  * (`/root/reference/config.go:10-16`: `endpoint`, `accesskey`,
  * `secretkey`, `bucket`, `usessl` in a flat YAML, default file name
  * `agni.yml`, `main.go:44`), mapped onto the Spark-native equivalent:
  * Hadoop `fs.s3a.*` settings, so every [[BlockIO]] path — shipper
  * uploads, server block sync, DSv2 scans — resolves `s3a://bucket/...`
  * with these credentials.
  *
  * The file is a flat `key: value` YAML subset (exactly the shape the
  * reference reads); no YAML library is needed or used. Unknown keys
  * are rejected loudly — a typo'd credential key silently ignored is a
  * misconfigured production store.
  */
final case class GraftConfig(endpoint: String, accessKey: String,
                             secretKey: String, bucket: String,
                             useSsl: Boolean) {

  /** Root URI of the configured bucket — the reference's block-store
    * location (`shipper.go` uploads under the bucket root). */
  def bucketRoot: String = s"s3a://$bucket"

  /** Apply as s3a settings. A custom `endpoint` (the reference's minio
    * deployment shape) implies path-style access — virtual-host-style
    * addressing assumes AWS DNS. */
  def applyTo(conf: Configuration): Configuration = {
    if (endpoint.nonEmpty) {
      conf.set("fs.s3a.endpoint", endpoint)
      conf.setBoolean("fs.s3a.path.style.access", true)
    }
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
    conf.setBoolean("fs.s3a.connection.ssl.enabled", useSsl)
    conf
  }
}

object GraftConfig {

  private val Keys = Set("endpoint", "accesskey", "secretkey", "bucket", "usessl")

  /** Load from a file path (any [[BlockIO]]-resolvable URI). */
  def load(path: String, conf: Configuration = null): GraftConfig =
    parse(BlockIO.readString(path, conf), path)

  /** Parse the flat YAML subset: `key: value` lines, `#` comments,
    * blank lines; values may be single- or double-quoted. */
  def parse(text: String, where: String = "<inline>"): GraftConfig = {
    val kv = scala.collection.mutable.Map[String, String]()
    text.split("\n").zipWithIndex.foreach { case (raw, i) =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val sep = line.indexOf(':')
        require(sep > 0, s"$where:${i + 1}: expected `key: value`, got: $raw")
        val k = line.substring(0, sep).trim.toLowerCase
        require(Keys(k), s"$where:${i + 1}: unknown key `$k` (expected one of ${Keys.toSeq.sorted.mkString(", ")})")
        require(!kv.contains(k), s"$where:${i + 1}: duplicate key `$k`")
        kv(k) = unquote(line.substring(sep + 1).trim)
      }
    }
    require(kv.contains("bucket") && kv("bucket").nonEmpty,
      s"$where: `bucket` is required")
    GraftConfig(
      endpoint = kv.getOrElse("endpoint", ""),
      accessKey = kv.getOrElse("accesskey", ""),
      secretKey = kv.getOrElse("secretkey", ""),
      bucket = kv("bucket"),
      useSsl = kv.get("usessl").exists { v =>
        require(v == "true" || v == "false", s"$where: usessl must be true/false, got `$v`")
        v == "true"
      })
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** `--config=<path>` flag support for the CLI mains: returns (config
    * applied to the session's Hadoop conf if the flag is present,
    * remaining args). */
  def fromArgs(args: Array[String],
               conf: => Configuration): (Option[GraftConfig], Array[String]) = {
    val (flags, rest) = args.partition(_.startsWith("--config="))
    val cfg = flags.lastOption.map { f =>
      val c = load(f.substring("--config=".length))
      c.applyTo(conf)
      c
    }
    (cfg, rest)
  }
}
