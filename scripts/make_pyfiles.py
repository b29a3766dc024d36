"""Build the ``--py-files`` artifact for cluster launches.

Packs ``graph_mining_spark/`` into a single deterministic zip
(``dist/graph_mining_spark.zip``): fixed timestamps, sorted member
order, no bytecode — so the artifact hash is a pure function of the
source tree and cluster-side caches based on file checksums stay
valid across rebuilds of identical code.

Usage:

    python scripts/make_pyfiles.py            # writes dist/graph_mining_spark.zip
    python scripts/make_pyfiles.py /out/x.zip # custom path

then launch any job module on a real cluster:

    spark-submit --master <cluster> \
        --py-files dist/graph_mining_spark.zip \
        bench.py

Executors unpack the zip onto ``sys.path``, so every import inside the
package (operators / functions / streaming) resolves worker-side —
which is what lets the mapInArrow / applyInPandas kernels find their
module code on executors that never saw the repo checkout.
"""

from __future__ import annotations

import os
import sys
import zipfile

# zip epoch (1980-01-01): zipfile's minimum — constant so the archive
# bytes depend only on source contents, never on build time
_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "graph_mining_spark")
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, root)
            members.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc.replace(os.sep, "/"), date_time=_FIXED_DATE)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/graph_mining_spark.zip"
    path = build(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} modules")
