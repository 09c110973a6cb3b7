#!/usr/bin/env python
"""Build dist/cse_spark.zip for ``spark-submit --py-files``.

Executors resolve ``commentsearchengine_spark`` (and the oracle, for
debug parity runs) by module name from this archive — driver-side
sys.path hacks never reach executor Python workers.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "cse_spark.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("commentsearchengine_spark", "oracle"):
            for dirpath, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, REPO))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
