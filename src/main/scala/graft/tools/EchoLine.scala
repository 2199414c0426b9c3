package graft.tools

/** Capture-contract probe (not part of the driver contract).
  *
  * The driver reads graft.Bench's result by taking the tail of the
  * combined `sbt -batch 'runMain ...'` output and json-parsing a line.
  * This main emits a trivially-recognizable JSON line the same way
  * Bench does (println to forked stdout) so the sbt output plumbing —
  * `run / outputStrategy := StdoutOutput` (no "[info] " prefix) and
  * `Global / showSuccess := false` (no trailing "[success]" line) —
  * can be validated in seconds instead of a 40-minute bench run:
  *
  *   sbt -batch 'runMain graft.tools.EchoLine' > /tmp/echo.out 2>&1
  *   python3 - <<'EOF'
  *   import json
  *   tail = open('/tmp/echo.out').read()[-2000:]
  *   assert any(l.startswith('{') and json.loads(l)
  *              for l in tail.splitlines() if l.strip().startswith('{'))
  *   EOF
  */
object EchoLine {
  def main(args: Array[String]): Unit = {
    System.err.println("[echo] stderr noise before the line")
    println("""{"metric":"echo","value":1,"unit":"probe"}""")
  }
}
