"""PII / toxicity scrubbing — ordered regex rewrite, vectorized.

The scrub is a fixed ORDERED list of (name, pattern, replacement); order is
part of the byte-identity contract (earlier rules see the original text,
later rules see prior replacements). Both the Spark pandas-UDF path and the
golden oracle call :func:`scrub_series`; per-rule hit counts feed the
metrics table (mirroring the reference's report-style accounting,
``index.js:293-318`` buildMeta).
"""

from __future__ import annotations

import re

import pandas as pd

# (name, compiled pattern, replacement) — ORDER MATTERS.
SCRUB_RULES: list[tuple[str, re.Pattern, str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    ("ipv4", re.compile(r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}"
                        r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\b"), "<IP>"),
    ("ssn", re.compile(r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"), "<SSN>"),
    ("credit_card", re.compile(r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b"), "<CC>"),
    ("phone", re.compile(r"(?<![0-9])(?:\+?1[ .-])?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}"
                         r"(?![0-9])"), "<PHONE>"),
    # toxicity: tiny fixed lexicon, whole-word, case-insensitive
    ("toxicity", re.compile(r"\b(?:badword|slurword|vileword)\b", re.IGNORECASE), "<TOX>"),
]

SCRUB_RULE_NAMES = [name for name, _, _ in SCRUB_RULES]


def scrub_series(texts: pd.Series) -> pd.DataFrame:
    """-> DataFrame(text=scrubbed, plus one int64 hit-count column per rule)."""
    s = texts.fillna("")
    out = {"text": None}
    for name, pat, repl in SCRUB_RULES:
        out[f"scrub_{name}"] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out["text"] = s
    return pd.DataFrame(out, index=texts.index)
