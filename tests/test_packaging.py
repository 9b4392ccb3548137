"""The north rule ships the job via `spark-submit --py-files
matric_spark.zip main.py`: the package must import standalone from the
zip (no repo checkout, no data files, no relative-path tricks). This
builds the zip exactly as tools/package.sh does and imports every
module from it in a clean subprocess whose cwd is elsewhere."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "matric_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))


def test_zip_imports_standalone(tmp_path):
    zpath = str(tmp_path / "matric_spark.zip")
    _build_zip(zpath)
    code = """
import pkgutil, sys, importlib
sys.path.insert(0, sys.argv[1])
import matric_spark
assert matric_spark.__file__.startswith(sys.argv[1]), matric_spark.__file__
n = 0
for m in pkgutil.walk_packages(matric_spark.__path__, "matric_spark."):
    importlib.import_module(m.name)
    n += 1
assert n >= 25, f"only {n} modules found in the zip"
print("imported", n, "modules from zip")
"""
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        cwd=str(tmp_path),  # NOT the repo: the checkout must not leak in
        env={**os.environ, "PYTHONPATH": ""},
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "imported" in out.stdout
