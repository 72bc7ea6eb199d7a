"""Regenerate tests/golden/uax29_{corpus.txt,golden.tsv} by RUNNING the
reference's generated UAX#29 scanner.

The golden is true reference output (the same methodology as the
SmallFloat / BM25 / Porter goldens): the checked-in, jflex-generated
``StandardTokenizerImpl.java``
(reference: lucene/core/src/java/org/apache/lucene/analysis/standard/)
is copied to a scratch dir with three mechanical patches so it compiles
standalone under the available JDK 17 (the full core needs 21+):

- drop the package declaration and the CharTermAttribute import;
- inline the 8 ``StandardTokenizer.<TYPE>`` int constants (0..7);
- replace ``getText(CharTermAttribute)`` with a ``tokenText()`` that
  returns ``new String(zzBuffer, zzStartRead, zzMarkedPos-zzStartRead)``
  (the exact same span the reference copies into the attribute).

A tiny driver (TokGold.java, inlined below) reads pre-LOWERCASED UTF-8
lines from stdin and prints one row per token:
``lineNo TAB tokenType TAB cp1,cp2,...`` (code points in hex). Feeding
lowercased text to both sides removes the one pipeline-order difference
(we lowercase before tokenizing; the reference after).

Usage (needs the read-only reference checkout + javac):

    python tools/make_uax29_golden.py /root/reference /tmp/tokgold

The corpus below is the committed test corpus: hand-picked coverage of
every grammar branch plus every regression found by differential
fuzzing (Hebrew quote forms at iteration boundaries, RI presentation
selectors, keycap-vs-numeric absorption, stranded ZWJ, tag sequences).
The fuzz harness itself (30k random lines over a mixed-class alphabet,
compared token-for-token against the Java scanner) is reproduced in
tests/test_tokenizer.py::test_uax29_fuzz_vs_reference_golden's comment.
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

TOKGOLD_JAVA = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;

public class TokGold {
  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line; int n = 0;
    while ((line = in.readLine()) != null) {
      n++;
      StandardTokenizerImpl sc = new StandardTokenizerImpl(new StringReader(line));
      while (true) {
        int t = sc.getNextToken();
        if (t == StandardTokenizerImpl.YYEOF) break;
        String tok = sc.tokenText();
        StringBuilder sb = new StringBuilder();
        tok.codePoints().forEach(cp -> {
          if (sb.length() > 0) sb.append(',');
          sb.append(Integer.toHexString(cp));
        });
        out.println(n + "\t" + t + "\t" + sb);
      }
    }
    out.flush();
  }
}
"""


def patch_impl(src: str) -> str:
    src = src.replace("package org.apache.lucene.analysis.standard;", "")
    src = src.replace(
        "import org.apache.lucene.analysis.tokenattributes.CharTermAttribute;",
        "")
    for i, name in enumerate(("ALPHANUM", "NUM", "SOUTHEAST_ASIAN",
                              "IDEOGRAPHIC", "HIRAGANA", "KATAKANA",
                              "HANGUL", "EMOJI")):
        src = src.replace(f"StandardTokenizer.{name}", str(i))
    src = src.replace(
        "public final void getText(CharTermAttribute t) {",
        "public final String tokenText() { return new String(zzBuffer,"
        " zzStartRead, zzMarkedPos-zzStartRead); }"
        " private void unusedGetText() {")
    src = src.replace(
        "t.copyBuffer(zzBuffer, zzStartRead, zzMarkedPos-zzStartRead);", "")
    return src


def main(ref_root: str, work: str) -> None:
    workdir = pathlib.Path(work)
    workdir.mkdir(parents=True, exist_ok=True)
    impl = pathlib.Path(
        ref_root, "lucene/core/src/java/org/apache/lucene/analysis/"
                  "standard/StandardTokenizerImpl.java").read_text("utf-8")
    (workdir / "StandardTokenizerImpl.java").write_text(
        patch_impl(impl), "utf-8")
    (workdir / "TokGold.java").write_text(TOKGOLD_JAVA, "utf-8")
    subprocess.run(["javac", "-nowarn", "-encoding", "UTF-8",
                    "StandardTokenizerImpl.java", "TokGold.java"],
                   cwd=workdir, check=True)
    here = pathlib.Path(__file__).resolve().parent.parent
    corpus = here / "tests/golden/uax29_corpus.txt"
    golden = here / "tests/golden/uax29_golden.tsv"
    with open(corpus, "rb") as fin, open(golden, "wb") as fout:
        subprocess.run(["java", "TokGold"], cwd=workdir,
                       stdin=fin, stdout=fout, check=True)
    n = len(re.findall(rb"\n", golden.read_bytes()))
    print(f"wrote {golden} ({n} token rows)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/tokgold")
