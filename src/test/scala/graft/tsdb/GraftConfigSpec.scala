package graft.tsdb

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `agni.yml` remote-store config (`config.go:10-16`)
  * mapped onto `fs.s3a.*` Hadoop settings. */
class GraftConfigSpec extends AnyFunSuite {

  test("parse the reference's flat YAML shape; apply as s3a settings") {
    val cfg = GraftConfig.parse(
      """# remote block store
        |endpoint: "minio.local:9000"
        |accesskey: AKIAEXAMPLE
        |secretkey: 'se/cr+et'   # trailing comment
        |bucket: agni-blocks
        |usessl: false
        |""".stripMargin)
    assert(cfg == GraftConfig("minio.local:9000", "AKIAEXAMPLE",
      "se/cr+et", "agni-blocks", useSsl = false))
    assert(cfg.bucketRoot == "s3a://agni-blocks")
    val hc = cfg.applyTo(new Configuration(false))
    assert(hc.get("fs.s3a.endpoint") == "minio.local:9000")
    assert(hc.get("fs.s3a.access.key") == "AKIAEXAMPLE")
    assert(hc.get("fs.s3a.secret.key") == "se/cr+et")
    // custom endpoint (minio shape) implies path-style addressing
    assert(hc.getBoolean("fs.s3a.path.style.access", false))
    assert(!hc.getBoolean("fs.s3a.connection.ssl.enabled", true))
  }

  test("AWS shape: no endpoint leaves addressing alone; ssl on") {
    val hc = GraftConfig.parse("bucket: b\nusessl: true\naccesskey: a\nsecretkey: s")
      .applyTo(new Configuration(false))
    assert(hc.get("fs.s3a.endpoint") == null)
    assert(hc.get("fs.s3a.path.style.access") == null)
    assert(hc.getBoolean("fs.s3a.connection.ssl.enabled", false))
  }

  test("malformed configs are rejected loudly, with position") {
    val noBucket = intercept[IllegalArgumentException](GraftConfig.parse("usessl: true"))
    assert(noBucket.getMessage.contains("`bucket` is required"))
    val typo = intercept[IllegalArgumentException](
      GraftConfig.parse("bucket: b\nsecertkey: oops", where = "agni.yml"))
    assert(typo.getMessage.contains("agni.yml:2") &&
      typo.getMessage.contains("unknown key `secertkey`"))
    val dup = intercept[IllegalArgumentException](
      GraftConfig.parse("bucket: a\nbucket: b"))
    assert(dup.getMessage.contains("duplicate key"))
    val badBool = intercept[IllegalArgumentException](
      GraftConfig.parse("bucket: b\nusessl: yes"))
    assert(badBool.getMessage.contains("usessl must be true/false"))
    val noColon = intercept[IllegalArgumentException](
      GraftConfig.parse("bucket b"))
    assert(noColon.getMessage.contains("expected `key: value`"))
  }

  test("load from file + --config= flag applies to a live conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val f = dir.resolve("agni.yml")
    java.nio.file.Files.writeString(f,
      "endpoint: e:9000\naccesskey: a\nsecretkey: s\nbucket: bb\n")
    val hc = new Configuration(false)
    val (cfg, rest) = GraftConfig.fromArgs(
      Array("/store", s"--config=$f", "blocks"), hc)
    assert(cfg.exists(_.bucket == "bb"))
    assert(rest.toSeq == Seq("/store", "blocks")) // flag consumed, order kept
    assert(hc.get("fs.s3a.access.key") == "a")
    // no flag → no config, conf untouched
    val hc2 = new Configuration(false)
    val (none, all) = GraftConfig.fromArgs(Array("x", "y"), hc2)
    assert(none.isEmpty && all.toSeq == Seq("x", "y") && hc2.get("fs.s3a.access.key") == null)
  }
}
