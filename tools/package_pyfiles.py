"""Package the engine for ``spark-submit --py-files`` (north rule: the
job ships to a multi-executor cluster as a zip on the PYTHONPATH of every
executor).

    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files dist/limetrans_spark.zip your_job.py

The zip contains the ``limetrans_spark`` package only — no tests, no
bytecode; deterministic member order + zeroed timestamps so re-packaging
an unchanged tree is byte-identical (reproducible deploys).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "limetrans_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "limetrans_spark")
    members = []
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in members:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    print(package(sys.argv[1] if len(sys.argv) > 1 else None))
