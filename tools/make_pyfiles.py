"""Build the ``--py-files`` artifact for cluster submission.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster". The engine is pure Python (no jars, no native code), so the
whole deployable is one zip of the ``fastlink_spark`` package:

    python tools/make_pyfiles.py            # -> dist/fastlink_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/fastlink_spark.zip your_job.py

The zip is built deterministically (sorted entries, zeroed timestamps)
so re-builds of an unchanged tree are byte-identical — the artifact can
be content-addressed by the deploy system.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "fastlink_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "fastlink_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
