package graft.sources

/** Vendored golden fixtures from the reference's own regression suite
  * (Udopia/gbdc, MIT — /root/reference/test/resources/). Two kinds:
  *
  *  - [[hashNamed]]: instance files whose FILENAME embeds the expected
  *    gbd-hash as a 32-hex md5 prefix (`<md5>-name.cnf.xz`) — the
  *    reference's content-addressing convention, so the expected hash comes
  *    from the reference tree, not from this engine.
  *  - the `cnf_test`/`wcnf_test`/`opb_test` fixtures exercised by the
  *    reference's feature-extraction regression
  *    (test/tests_feature_extraction.cc:37-66 against
  *    test/resources/expected_records/<family>.txt) — the q56/q57 oracles
  *    hard-code values from those records.
  *
  * All fixtures are stored xz-COMPRESSED exactly as the reference ships
  * them: the driver queries decompress in-plan (S1 ingestion contract),
  * so a green row proves compressed bytes → decompress → kernels end to
  * end with constants from the reference tree.
  */
object GoldenFixtures {

  /** `<gbdhash>-name.cnf.xz` fixtures (hash = filename prefix). */
  val hashNamed: Seq[String] = Seq(
    "0297c2a35f116ffd5382aea5b421e6df-Urquhart-s3-b3.shuffled-as.sat03-1556.cnf.xz",
    "246afd75cb97a21144f368c00252a656-BZ2File_write_11.cnf.xz",
    "328da7966b09b2f6e99c93c4e877fbff-sgen3-n260-s62321009-sat.cnf.xz")

  val CnfTest = "cnf_test.cnf.xz"
  val WcnfTest = "wcnf_test.wcnf.xz"
  val OpbTest = "opb_test.opb.xz"

  /** Raw (still-compressed) fixture bytes from the library classpath. */
  def bytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/goldens/$name")
    require(in != null, s"missing golden resource $name")
    try in.readAllBytes()
    finally in.close()
  }
}
