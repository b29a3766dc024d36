"""The --py-files artifact must be importable standalone (zipimport),
deterministic (same source -> same bytes), and complete (every module
of the package present) — the launch contract for
``spark-submit --py-files dist/graph_mining_spark.zip``."""

import hashlib
import os
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from make_pyfiles import build  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pkg_modules():
    out = set()
    pkg = os.path.join(ROOT, "graph_mining_spark")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                out.add(os.path.relpath(os.path.join(dirpath, fn), ROOT).replace(os.sep, "/"))
    return out


def test_zip_complete_and_deterministic(tmp_path):
    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    assert hashlib.sha256(open(z1, "rb").read()).hexdigest() == hashlib.sha256(
        open(z2, "rb").read()
    ).hexdigest()
    assert set(zipfile.ZipFile(z1).namelist()) == _pkg_modules()


def test_zip_imports_without_repo_checkout(tmp_path):
    """Import the full operator surface from the zip alone, from a cwd
    that does NOT contain the package — the executor-side situation."""
    z = build(str(tmp_path / "pkg.zip"))
    code = (
        "import sys, importlib; sys.path.insert(0, %r)\n"
        "m = importlib.import_module('graph_mining_spark.operators.pagerank')\n"
        "importlib.import_module('graph_mining_spark.operators.terahac')\n"
        "importlib.import_module('graph_mining_spark.functions.dedup')\n"
        "importlib.import_module('graph_mining_spark.streaming')\n"
        "assert 'pkg.zip' in m.__file__\n"
        "print('ok')\n" % z
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout
