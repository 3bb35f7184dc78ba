"""Build dist/ksana_corpus_builder_spark.zip for spark-submit --py-files.

Zips the package (source only, no caches) so executors can import the
kernels. Usage: python tools/build_pyfiles.py [out_dir]
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "ksana_corpus_builder_spark"


def build(out_dir: pathlib.Path) -> pathlib.Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "ksana_corpus_builder_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    dest = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "dist"
    print(build(dest))
