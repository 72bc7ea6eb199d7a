"""Package lucene_spark for cluster submission.

Builds dist/lucene_spark.zip — a zipimport-able archive of the engine
package — for use as:

    spark-submit --py-files dist/lucene_spark.zip tools/submit_build.py \
        --input s3://bucket/transcripts --output s3://bucket/index

The zip contains only the package sources (no tests/fixtures-data), so
executors unpack a few hundred KB.

Usage: python tools/make_pyfiles.py [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "lucene_spark.zip")
    pkg = os.path.join(REPO, "lucene_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                ap = os.path.join(root, f)
                rel = os.path.relpath(ap, REPO)
                z.write(ap, rel)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
