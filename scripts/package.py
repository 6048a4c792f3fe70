"""Build dist/osmospark.zip for spark-submit --py-files.

The zip contains the pure-Python osmospark package (no compiled deps), so
``spark-submit --py-files dist/osmospark.zip scripts/crawl_job.py`` runs on
any cluster with PySpark + pandas + numpy on the executors.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "osmospark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "osmospark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in sorted(os.walk(pkg)):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
