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


# Per-row Python iteration over batch columns inside hot-path kernels —
# `for x in pdf[...]`, `zip(pdf[...]`, `.iterrows()`. Parser kernels
# (functions/) iterate per DOCUMENT by design (state-machine parse has no
# vector form), so the lint covers the columnar-math operators where a
# loop means an unvectorized kernel — including the media header decoders
# (whole-batch np.frombuffer since round 3).
_ROW_LOOP = re.compile(r"for\s+[\w, ]+\s+in\s+(zip\(\s*pdf\[|pdf\[)|\.iterrows\(\)")
_ROW_LOOP_FILES = ("operators/ann.py", "operators/rangejoin.py",
                   "operators/dedup.py", "operators/skew.py",
                   "operators/tpos.py", "operators/postings.py",
                   "operators/bigram.py", "operators/media.py",
                   "tokenizer.py")


def test_no_per_row_loops_in_columnar_kernels():
    offenders = []
    for rel in _ROW_LOOP_FILES:
        p = PKG / rel
        if not p.exists():
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if _ROW_LOOP.search(line):
                offenders.append(f"{rel}:{i}")
    assert not offenders, f"per-row Python loops in columnar kernels: {offenders}"


def test_no_unmarked_collect_anywhere():
    # the engine must stay distributed; EVERY driver-side collect in
    # non-test code needs a `# collect-ok:` marker — a reviewed, BOUNDED
    # dim-sized collect (e.g. n_cells IVF centroids, one query vector),
    # never data-sized. Repo-wide, not just operators/ (CLAUDE.md
    # invariant; VERDICT r2 "Next round" #5).
    offenders = []
    for p in PKG.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if ".collect()" in line and "# collect-ok:" not in line:
                offenders.append(f"{p.relative_to(PKG)}:{i}")
    assert not offenders, f"unmarked driver-side collect in {offenders}"
