"""Package ``logprocessor_spark`` for ``spark-submit --py-files`` — the
north-rule deployment unit (BASELINE.json: "run via spark-submit
--py-files on a multi-executor cluster").

Builds a source zip of the package (no tests/tools, no bytecode) plus a
minimal launcher script, and prints the exact spark-submit command.
Usage::

    python tools/package.py [dist_dir]      # default ./dist
    spark-submit --master <...> --py-files dist/logprocessor_spark.zip \
        dist/submit_job.py --pages <pages_dir> --out <out_dir>

The zip is what ships to executors: every import inside the package is
relative or stdlib/pyspark/numpy/pandas, so the archive is
self-contained against a stock PySpark runtime.
"""

from __future__ import annotations

import os
import sys
import zipfile

LAUNCHER = """\
\"\"\"spark-submit entry: thin shim over logprocessor_spark.job.main so the
package arrives via --py-files (executors import from the shipped zip).\"\"\"
from logprocessor_spark.job import main

if __name__ == "__main__":
    main()
"""


def build(dist_dir: str = "dist") -> tuple[str, str]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "logprocessor_spark")
    os.makedirs(dist_dir, exist_ok=True)
    zpath = os.path.abspath(os.path.join(dist_dir, "logprocessor_spark.zip"))
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for nm in sorted(files):
                if not nm.endswith(".py"):
                    continue
                full = os.path.join(root, nm)
                z.write(full, os.path.relpath(full, repo))
    lpath = os.path.abspath(os.path.join(dist_dir, "submit_job.py"))
    with open(lpath, "w") as f:
        f.write(LAUNCHER)
    return zpath, lpath


def main() -> None:
    dist = sys.argv[1] if len(sys.argv) > 1 else "dist"
    zpath, lpath = build(dist)
    print(f"built {zpath}")
    print(
        "run: spark-submit --master local[8] "
        f"--py-files {zpath} {lpath} --pages <pages_dir> --out <out_dir>"
    )


if __name__ == "__main__":
    main()
