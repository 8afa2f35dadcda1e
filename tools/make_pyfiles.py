"""Build the --py-files artifact: dist/openstreetmapio_jl_spark.zip.

The north rule requires the engine to run via ``spark-submit --py-files`` on a
multi-executor cluster. This zips the pure-Python package (no build step, no
native deps) so executors can import it from the shipped archive::

    python tools/make_pyfiles.py
    spark-submit --py-files dist/openstreetmapio_jl_spark.zip jobs/pip_join_job.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "openstreetmapio_jl_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
