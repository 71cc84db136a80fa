"""Build dist/whitebox_tools_spark.zip for spark-submit --py-files.

Zips the package (source only, no tests/caches) so executors can import
it; the entry script (scripts/submit_job.py) travels as the submitted
file itself.
"""

from __future__ import annotations

import os
import zipfile


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "whitebox_tools_spark.zip")
    pkg = os.path.join(root, "whitebox_tools_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    print(out)


if __name__ == "__main__":
    main()
