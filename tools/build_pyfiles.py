"""Build caraspark.zip for ``spark-submit --py-files`` (north_rule delivery
form). Pure-source zip — the engine has no binary deps beyond NumPy/pandas,
which live on the executors already.

    python tools/build_pyfiles.py [out.zip]      # default: ./caraspark.zip
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("caraspark", "oracle"):
            for p in sorted((ROOT / pkg).rglob("*.py")):
                z.write(p, p.relative_to(ROOT))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(ROOT / "caraspark.zip")
    n = build(out)
    print(f"wrote {n} files to {out}")
