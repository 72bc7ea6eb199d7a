"""Regenerate tests/golden/phonetic_golden.tsv by RUNNING the exact
encoder library the reference's phonetic module delegates to.

The reference's analysis/phonetic filters are thin wrappers over Apache
commons-codec (lucene/analysis/phonetic/src/java/org/apache/lucene/
analysis/phonetic/PhoneticFilter.java:38 `org.apache.commons.codec
.Encoder`, DoubleMetaphoneFilter.java:21 `org.apache.commons.codec
.language.DoubleMetaphone`).  commons-codec ships inside PySpark's own
jar directory, so the golden is produced by the REAL encoders:

    word TAB soundex TAB dm_primary TAB dm_alternate

over (a) the sf0.01 documents vocabulary, (b) a surname battery, and
(c) deterministic fuzz words biased toward the algorithms' special
cases (H/W runs, GH/CH/SCH clusters, slavo-germanic markers, leading
vowel/KN/GN/PN/WR/PS, X/Z endings, mixed alnum).

Usage: python tools/make_phonetic_golden.py [workdir]
"""

from __future__ import annotations

import glob
import pathlib
import random
import re
import string
import subprocess
import sys

GOLD_JAVA = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.commons.codec.language.DoubleMetaphone;
import org.apache.commons.codec.language.Soundex;

public class PhoneticGold {
  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new BufferedWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8)));
    Soundex sx = new Soundex();
    DoubleMetaphone dm = new DoubleMetaphone();
    dm.setMaxCodeLen(4);
    String w;
    while ((w = in.readLine()) != null) {
      String s;
      try { s = sx.soundex(w); } catch (RuntimeException e) { s = "<ERR>"; }
      String p = dm.doubleMetaphone(w);
      String a = dm.doubleMetaphone(w, true);
      out.println(w + "\t" + (s == null ? "" : s)
                    + "\t" + (p == null ? "" : p)
                    + "\t" + (a == null ? "" : a));
    }
    out.flush();
  }
}
"""

SURNAMES = """smith smyth smithe schmidt schmitt schneider snyder johnson
jonson jansen johansen williams wilhelms brown braun jones miller mueller
muller davis garcia rodriguez wilson martinez anderson andersen taylor
thomas hernandez moore martin jackson thompson thomsen white lopez lee
gonzalez harris clark lewis robinson walker perez hall young allen wright
wrigt king scott green knight knigt nite wajda caesar cesar cicero chianti
michael michel filipowicz filipowitz ghiradelli ghislane hochmeier jose
san-jose yankelovich zhang zhao xiao xu dumb thumb lamb campbell raspberry
pizza pezza edge hedge judge ledger roger gif gift ranger danger anger
island isle carlisle carlysle aisle wasserman vasserman uomo womo arnow
arnoff cabrillo gallegos caught knox nose noze ptomaine psalm pneumonia
wrack write school schedule character chorus cheese church chef tichner
tough though through laugh cough draught bacher macher eichner hugh
wachtler wechsler weeks wicks box tax sugar succeed success accident
occident"""

def fuzz_words(n: int, seed: int = 20260820) -> list:
    rng = random.Random(seed)
    clusters = ["gh", "ch", "sch", "th", "wh", "hw", "kn", "gn", "pn",
                "wr", "ps", "mb", "dge", "tch", "sio", "tio", "cia",
                "czy", "witz", "wicz", "sz", "cz", "tz", "zz", "ll",
                "gli", "ey", "au", "ou", "ie", "hh", "ww", "whw", "xx",
                "ck", "cc", "cq", "qq", "gg", "dj", "dt", "nch", "rch"]
    out = []
    for _ in range(n):
        parts = []
        for _k in range(rng.randint(1, 5)):
            if rng.random() < 0.55:
                parts.append(rng.choice(clusters))
            else:
                parts.append(rng.choice(string.ascii_lowercase))
        w = "".join(parts)
        if rng.random() < 0.15:
            w = w + rng.choice(["s", "es", "x", "z", "e", "h", "w"])
        if rng.random() < 0.10:  # mixed alnum like UAX#29 ALPHANUM tokens
            w = w + str(rng.randint(0, 99))
        if rng.random() < 0.05:
            w = str(rng.randint(0, 9)) + w
        out.append(w)
    return out


def main() -> None:
    work = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                        else "/tmp/phonetic_gold")
    work.mkdir(parents=True, exist_ok=True)
    jars = sorted(glob.glob(
        "/root/.pyenv/versions/*/lib/python*/site-packages/pyspark/jars/"
        "commons-codec-*.jar"))
    if not jars:
        sys.exit("commons-codec jar not found")
    jar = jars[0]
    (work / "PhoneticGold.java").write_text(GOLD_JAVA)
    subprocess.run(["javac", "-cp", jar, "PhoneticGold.java"],
                   cwd=work, check=True)

    words = []
    seen = set()

    def add(w: str) -> None:
        if w and w not in seen:
            seen.add(w)
            words.append(w)

    import pandas as pd
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["text"])
    for t in docs["text"]:
        for w in re.findall(r"[0-9a-z]+", t.lower()):
            add(w)
    for w in SURNAMES.split():
        add(w)
    for w in fuzz_words(6000):
        add(w)

    proc = subprocess.run(
        ["java", "-cp", f"{jar}:.", "PhoneticGold"],
        cwd=work, input="\n".join(words) + "\n",
        capture_output=True, text=True, check=True)
    out = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
        "golden" / "phonetic_golden.tsv"
    out.write_text(proc.stdout)
    print(f"{len(words)} words -> {out}")


if __name__ == "__main__":
    main()
