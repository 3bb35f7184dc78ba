"""Vectorization discipline (SURVEY §7 hard-part 5, BASELINE input_hint):
zero per-row Python UDFs in the engine — only pandas/Arrow batch kernels
(mapInPandas / pandas_udf) are allowed."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "ksana_corpus_builder_spark"

# F.udf( / @udf — the row-at-a-time API
_SCALAR_UDF = re.compile(r"(?<![a-zA-Z_])udf\s*\(|@udf\b")


def test_no_row_at_a_time_udf():
    offenders = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        if _SCALAR_UDF.search(src):
            offenders.append(str(p))
    assert not offenders, f"row-at-a-time UDFs found in {offenders}"


def test_no_collect_in_operators():
    # operators must stay distributed; driver-side collect is allowed only
    # in queries.py (query parameters) and tools/tests. Exception: a line
    # carrying a `# collect-ok:` marker — a reviewed, BOUNDED dim-sized
    # collect (e.g. n_cells IVF centroids), never data-sized.
    offenders = []
    for sub in ("operators", "plans", "functions"):
        for p in (PKG / sub).rglob("*.py"):
            for i, line in enumerate(p.read_text().splitlines(), 1):
                if ".collect()" in line and "# collect-ok:" not in line:
                    offenders.append(f"{p}:{i}")
    assert not offenders, f"driver-side collect in {offenders}"
