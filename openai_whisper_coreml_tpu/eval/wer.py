"""Word-error-rate metrics + text normalisation (no external deps).

The reference has no evaluation at all (SURVEY.md §4: zero tests, zero
benchmarks). WER parity on LibriSpeech test-clean is this framework's
accuracy gate (BASELINE.md), so the metric lives in-repo: Levenshtein
alignment over words plus a simplified English normaliser matching the
intent of openai's EnglishTextNormalizer (lowercase, punctuation/annotation
stripping, whitespace collapse, common contraction standardisation).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

_ANNOTATION = re.compile(r"[<\[][^>\]]*[>\]]")  # [noise], <unk>, ...
_PUNCT = re.compile(r"[^\w\s']", re.UNICODE)
_SPACES = re.compile(r"\s+")

_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "shan't": "shall not",
    "'cause": "because",
}
_SUFFIXES = (
    ("n't", " not"), ("'re", " are"), ("'ve", " have"), ("'ll", " will"),
    ("'d", " would"), ("'m", " am"),
)


def normalize_text(text: str) -> str:
    """Normalise a transcript for WER comparison."""
    text = text.lower()
    text = _ANNOTATION.sub(" ", text)
    for full, repl in _CONTRACTIONS.items():
        text = text.replace(full, repl)
    for suffix, repl in _SUFFIXES:
        text = re.sub(rf"(\w){re.escape(suffix)}\b", rf"\1{repl}", text)
    text = _PUNCT.sub(" ", text)
    text = text.replace("'", "")
    return _SPACES.sub(" ", text).strip()


@dataclass
class WERResult:
    wer: float
    substitutions: int
    deletions: int
    insertions: int
    hits: int
    n_ref_words: int

    def as_dict(self) -> Dict[str, float]:
        return {
            "wer": self.wer,
            "substitutions": self.substitutions,
            "deletions": self.deletions,
            "insertions": self.insertions,
            "hits": self.hits,
            "ref_words": self.n_ref_words,
        }


def word_errors(ref_words: Sequence[str], hyp_words: Sequence[str]
                ) -> Tuple[int, int, int, int]:
    """(substitutions, deletions, insertions, hits) via Levenshtein DP."""
    n, m = len(ref_words), len(hyp_words)
    # dp[j] = (cost, subs, dels, ins) for prefix alignment
    INF = 1 << 30
    prev = [(j, 0, 0, j) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, i, 0)] + [(INF, 0, 0, 0)] * m
        for j in range(1, m + 1):
            if ref_words[i - 1] == hyp_words[j - 1]:
                cand = prev[j - 1]
                cur[j] = cand
            else:
                c_sub = (prev[j - 1][0] + 1, prev[j - 1][1] + 1,
                         prev[j - 1][2], prev[j - 1][3])
                c_del = (prev[j][0] + 1, prev[j][1], prev[j][2] + 1,
                         prev[j][3])
                c_ins = (cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2],
                         cur[j - 1][3] + 1)
                cur[j] = min(c_sub, c_del, c_ins)
        prev = cur
    cost, subs, dels, ins = prev[m]
    hits = n - subs - dels
    return subs, dels, ins, hits


def compute_wer(references: Sequence[str], hypotheses: Sequence[str],
                *, normalize: bool = True) -> WERResult:
    if len(references) != len(hypotheses):
        raise ValueError("reference/hypothesis count mismatch")
    total_s = total_d = total_i = total_h = total_n = 0
    for ref, hyp in zip(references, hypotheses):
        if normalize:
            ref, hyp = normalize_text(ref), normalize_text(hyp)
        rw, hw = ref.split(), hyp.split()
        s, d, i, h = word_errors(rw, hw)
        total_s += s
        total_d += d
        total_i += i
        total_h += h
        total_n += len(rw)
    wer = (total_s + total_d + total_i) / max(total_n, 1)
    return WERResult(wer, total_s, total_d, total_i, total_h, total_n)
