"""Regenerate tests/golden/wdgf_{corpus.txt,golden.tsv} by RUNNING the
reference's WordDelimiterIterator (the subword state machine inside
WordDelimiterGraphFilter).

Same methodology as the UAX#29 / Porter / SmallFloat goldens: the
reference source
(lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterIterator.java) is copied to a scratch dir
with one mechanical patch — the package declaration dropped so it
compiles standalone in the default package, where the driver can reach
its package-private members.

The driver (WdgfGold.java, inlined below) mimics the `wdgf` chain up to
the final LowerCaseFilter: it splits each stdin line on
Character.isWhitespace (WhitespaceTokenizer), truncates whitespace
tokens at 255 chars (CharTokenizer DEFAULT_MAX_WORD_LEN), then runs the
iterator with the DEFAULT_WORD_DELIM_TABLE and splitOnCaseChange =
splitOnNumerics = stemEnglishPossessive = true (the chain's flag set)
and prints one row per subword part:
``lineNo TAB partIdx TAB cp1,cp2,...`` (code points in hex; parts are
printed case-preserved — lowercasing is a shared chain stage tested
elsewhere).

Usage:  python tools/make_wdgf_golden.py /root/reference /tmp/wdgfgold
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

WDGF_GOLD_JAVA = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;

public class WdgfGold {
  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    WordDelimiterIterator it = new WordDelimiterIterator(
        WordDelimiterIterator.DEFAULT_WORD_DELIM_TABLE, true, true, true);
    String line; int n = 0;
    while ((line = in.readLine()) != null) {
      n++;
      // WhitespaceTokenizer: maximal runs of !Character.isWhitespace,
      // truncated at 255 chars (CharTokenizer DEFAULT_MAX_WORD_LEN)
      List<String> toks = new ArrayList<>();
      StringBuilder cur = new StringBuilder();
      for (int i = 0; i < line.length(); ) {
        int cp = line.codePointAt(i);
        i += Character.charCount(cp);
        if (Character.isWhitespace(cp)) {
          if (cur.length() > 0) { toks.add(cur.toString()); cur.setLength(0); }
        } else {
          cur.appendCodePoint(cp);
          if (cur.length() >= 255) { toks.add(cur.toString()); cur.setLength(0); }
        }
      }
      if (cur.length() > 0) toks.add(cur.toString());
      int k = 0;
      for (String tok : toks) {
        char[] cs = tok.toCharArray();
        it.setText(cs, cs.length);
        while (it.next() != WordDelimiterIterator.DONE) {
          String part = new String(cs, it.current, it.end - it.current);
          StringBuilder sb = new StringBuilder();
          part.codePoints().forEach(cp -> {
            if (sb.length() > 0) sb.append(',');
            sb.append(Integer.toHexString(cp));
          });
          out.println(n + "\t" + (k) + "\t" + sb);
          k++;
        }
      }
    }
    out.flush();
  }
}
"""

CORPUS = [
    # javadoc examples + flag interactions
    "PowerShot500 Wi-Fi SD500 O'Neil's wi-fi",
    "j2se XMLHttpRequest ABCDef McDonald's powerShot PowerShot",
    "500-42 1,000.5 --- '''' a-b-c A-B-C",
    "super-duper-XL500-42-AutoCoder! mid'90s McKinley's'",
    "o'neil's O'NEIL'S 's s' ''s s''",
    # possessive edge cases: S vs s, at bounds, mid-token, non-alpha before
    "Neil'S cat's' 'dog's 2's a''s it's'nt x's-y's",
    # latin-1 table rows: ª µ º ß × ÷ and accented case transitions
    "ª1µ2º ßeta STRAßE Ångström caFÉ ÇaVa ×÷ Déjà-Vu",
    # BMP categories: Lo (CJK/Hebrew), Nl (Ⅻ), No (½), Mn (combining)
    "日本語2020 שָׁלוֹם Ⅻ½ áb ÁB eéE",
    # supplementary plane: surrogates never split, bridge types
    "a\U0001F600b 𝐀𝐁c x\U0001D7CF9 \U0001F6001\U0001F601",
    # delimiters only / empty-ish tokens and bounds stripping
    "...a... ..A..b.. !!! ?a? -5- _x_",
    # numbers and mixed runs
    "v1.2.3-beta4 IPv6 2x4 3M 4°C 100% a1B2c3D4",
]


def main():
    ref = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else "/root/reference")
    work = pathlib.Path(sys.argv[2] if len(sys.argv) > 2
                        else "/tmp/wdgfgold")
    work.mkdir(parents=True, exist_ok=True)
    src = (ref / "lucene/analysis/common/src/java/org/apache/lucene/"
           "analysis/miscellaneous/WordDelimiterIterator.java").read_text()
    src = src.replace(
        "package org.apache.lucene.analysis.miscellaneous;", "")
    (work / "WordDelimiterIterator.java").write_text(src)
    (work / "WdgfGold.java").write_text(WDGF_GOLD_JAVA)
    subprocess.run(["javac", "WdgfGold.java",
                    "WordDelimiterIterator.java"],
                   cwd=work, check=True)

    here = pathlib.Path(__file__).resolve().parent.parent
    golden_dir = here / "tests" / "golden"
    corpus = "\n".join(CORPUS) + "\n"
    out = subprocess.run(["java", "WdgfGold"], cwd=work,
                         input=corpus.encode("utf-8"),
                         capture_output=True, check=True)
    (golden_dir / "wdgf_corpus.txt").write_bytes(corpus.encode("utf-8"))
    (golden_dir / "wdgf_golden.tsv").write_bytes(out.stdout)
    n = len(out.stdout.decode("utf-8").splitlines())
    print(f"wrote {n} golden parts for {len(CORPUS)} corpus lines")


if __name__ == "__main__":
    main()
