"""Pure-pandas golden oracle — NO Spark.

Runs the exact same vectorized kernels as the Spark pipeline
(plans/quality_pipeline.py) over a pandas DataFrame of pages. The pytest
golden tests (tests/test_pipeline_golden.py) assert:

- scrubbed text byte-identical per url (north-rule invariant), and
- keep/drop F1 >= 0.99 (exactly 1.0 by construction — same kernels —
  but the test computes real F1 so any Spark-side divergence, e.g. Arrow
  type coercion or batch-boundary effects, is caught).
"""

from __future__ import annotations

import pandas as pd

from ..functions import langid as L
from ..functions import quality as Q
from ..functions import scrub as S
from ..functions.perplexity import perplexity_series
from ..functions.text import extract_text


def run(pages: pd.DataFrame) -> pd.DataFrame:
    """pages(url, warc_ts, html, text, lang) -> oracle result frame."""
    text = extract_text(pages["html"])
    labels = Q.rules_hit_and_keep(text)
    lang = L.detect(text)
    scrubbed = S.scrub_series(text)
    out = pd.DataFrame({
        "url": pages["url"],
        "extracted_text": text,
        "scrubbed_text": scrubbed["text"],
        "keep": labels["keep"],
        "rules_hit": labels["rules_hit"],
        "lang_detected": lang["lang_detected"],
        "perplexity": perplexity_series(text),
    })
    for n in S.SCRUB_RULE_NAMES:
        out[f"scrub_{n}"] = scrubbed[f"scrub_{n}"]
    return out


def f1(oracle_keep: pd.Series, got_keep: pd.Series) -> float:
    tp = int((oracle_keep & got_keep).sum())
    fp = int((~oracle_keep & got_keep).sum())
    fn = int((oracle_keep & ~got_keep).sum())
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)
