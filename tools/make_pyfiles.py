"""Package the engine for spark-submit --py-files.

Produces dist/etl_documentos_spark.zip containing the package tree (pure
Python — executors import it from the zip directly).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "etl_documentos_spark.zip")
    pkg = os.path.join(ROOT, "etl_documentos_spark")
    # Deterministic archive: sorted entry order and a fixed timestamp, so
    # rebuilding from the same sources is byte-identical (the test suite
    # rebuilds it; content-addressed noise in git otherwise).
    entries = []
    for dirpath, _dirnames, filenames in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, ROOT), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    print(out)
    return out


if __name__ == "__main__":
    main()
