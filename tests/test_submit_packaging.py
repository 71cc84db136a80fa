"""spark-submit packaging: the --py-files zip must contain the package
source (importable layout) and nothing else."""

import subprocess
import sys
import zipfile


def test_make_pyfiles(tmp_path):
    out = subprocess.run([sys.executable, "scripts/make_pyfiles.py"],
                         capture_output=True, text=True, check=True)
    path = out.stdout.strip().splitlines()[-1]
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "whitebox_tools_spark/__init__.py" in names
    assert any(n == "whitebox_tools_spark/operators/hydro.py" for n in names)
    assert all(n.endswith(".py") for n in names)
    assert not any("__pycache__" in n or "tests/" in n for n in names)
