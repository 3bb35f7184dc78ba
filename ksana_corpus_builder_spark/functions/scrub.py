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

# PER-RULE cheap NECESSARY-condition gates, evaluated on the ORIGINAL
# text: every email match contains '@'; ipv4/cc/phone matches contain a
# digit; ssn contains a digit AND '-'; toxicity contains "word"
# (case-insensitive). A doc failing a rule's gate provably cannot match
# that rule, so its full-pattern scan is skipped. Gating on the original
# text is sound across the ordered rewrite because no replacement token
# (<EMAIL>/<IP>/<SSN>/<CC>/<PHONE>/<TOX>) contains a digit, '@', '-' or
# "word" — a replacement can never introduce a later rule's gate
# character. Literal/char-class probes are memchr-fast, unlike an
# alternation of the full patterns (measured: gates cut the kernel ~2x on
# the synthetic pages corpus, where 75% of docs have no digit at all).
_GATE_DIGIT = re.compile(r"[0-9]")
_GATE_TOX = re.compile(r"(?i)word")
# tighter per-rule necessary conditions, checked only on digit-bearing
# docs: every ipv4 match contains digit-dot-digit (octets may be 1 digit,
# so a 3-digit-run gate would be UNSOUND there); every ssn/phone match
# contains 3 consecutive digits ("[0-9]{3}-" / area code); every
# credit-card match contains 4. These simple patterns scan at C speed;
# the full rule patterns (alternations, boundary assertions) are ~5x the
# cost per byte and now run only on docs that can possibly match.
_GATE_D3 = re.compile(r"[0-9]{3}")
_GATE_D4 = re.compile(r"[0-9]{4}")
_GATE_IP = re.compile(r"[0-9]\.[0-9]")


def _gate_rows(vals) -> dict[str, list[int]]:
    has_at, has_ip, has_ssn, has_d4, has_d3, has_word = [], [], [], [], [], []
    dig, tox = _GATE_DIGIT.search, _GATE_TOX.search
    d3, d4, ip = _GATE_D3.search, _GATE_D4.search, _GATE_IP.search
    for i, v in enumerate(vals):
        if "@" in v:
            has_at.append(i)
        if dig(v) is not None:
            if ip(v) is not None:
                has_ip.append(i)
            if d3(v) is not None:
                has_d3.append(i)
                if "-" in v:
                    has_ssn.append(i)
                if d4(v) is not None:
                    has_d4.append(i)
        if tox(v) is not None:
            has_word.append(i)
    return {"email": has_at, "ipv4": has_ip, "ssn": has_ssn,
            "credit_card": has_d4, "phone": has_d3,
            "toxicity": has_word}


def scrub_series(texts: pd.Series) -> pd.DataFrame:
    """-> DataFrame(text=scrubbed, plus one int64 hit-count column per rule).

    One regex scan per rule per GATED doc: `Pattern.subn` returns
    (new_text, n_hits), so count+replace share the scan (the former
    str.count + str.replace pair walked every string twice per rule — this
    kernel is the pipeline's hottest, see BENCH notes)."""
    import numpy as np
    vals = texts.fillna("").to_numpy(dtype=object)
    n = len(vals)
    rows = _gate_rows(vals)
    out = {f"scrub_{name}": np.zeros(n, dtype=np.int64)
           for name, _, _ in SCRUB_RULES}
    for name, pat, repl in SCRUB_RULES:
        subn = pat.subn
        counts = out[f"scrub_{name}"]
        for i in rows[name]:
            vals[i], counts[i] = subn(repl, vals[i])
    return pd.DataFrame({"text": pd.Series(vals, index=texts.index), **out},
                        index=texts.index)
