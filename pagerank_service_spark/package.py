"""Build the --py-files zip (north rule: spark-submit packaging).

    python -m pagerank_service_spark.package [dist_dir]

produces ``dist/pagerank_service_spark.zip`` containing the package, and
``dist/cli_main.py`` as the spark-submit primary file.
"""

from __future__ import annotations

import os
import sys
import zipfile

CLI_MAIN = """\
from pagerank_service_spark.cli import main
import sys
sys.exit(main())
"""


def build(dist: str = "dist") -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "pagerank_service_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    with open(os.path.join(dist, "cli_main.py"), "w") as f:
        f.write(CLI_MAIN)
    return zpath


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
