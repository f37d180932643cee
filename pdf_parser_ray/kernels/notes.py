"""Notes segmentation + model-backed processing.

Rebuilds the reference's LLM notes path (``sec_parser/gemini_client.py``,
``pipeline.py:361-372``) with the engine's deterministic model stage:

* :func:`chunk_notes` mirrors ``_chunk_notes`` (``gemini_client.py:70-96``):
  split at ``Note <N>`` boundaries, fall back to heading boundaries, then
  re-pack parts under the character limit.
* :func:`process_notes_model` replaces the per-chunk Gemini call
  (``gemini_client.py:99-133``) with the feature-hash section classifier
  (:mod:`..stages.classify`): every chunk is scored, confidently
  non-notes TRAILING chunks (section-split bleed-through into MD&A/risk
  text) are dropped, surviving chunks go through ``clean_prose`` and join
  with a blank line — the same join the reference applies to per-chunk
  LLM results (``gemini_client.py:131-133``).

The model is deterministic, so the flagship stays byte-reproducible; the
classifier instance is built once per worker (stateful-stage contract) and
threaded in by :class:`..stages.extract.ExtractDocuments`.
"""

from __future__ import annotations

import re

from .prose import clean_prose

CHUNK_CHAR_LIMIT = 100_000

_NOTE_BOUNDARY = re.compile(r"(?=\n\s*(?:Note|NOTE)\s+\d+[\s.:\-—])",
                            re.IGNORECASE)
_HEADING_BOUNDARY = re.compile(r"(?=\n\s*#{1,3}\s+)")

# a chunk is dropped only when the model is confidently sure it belongs to
# one of these non-notes sections (trailing bleed-through)
_FOREIGN_LABELS = {"mda", "risk_factors", "other"}
_DROP_CONF = 0.40


def chunk_notes(text: str, limit: int = CHUNK_CHAR_LIMIT) -> list[str]:
    """Split notes text at note boundaries if it exceeds the limit
    (reference ``gemini_client.py:70-96`` semantics)."""
    if len(text) <= limit:
        return [text]
    parts = _NOTE_BOUNDARY.split(text)
    if len(parts) <= 1:
        parts = _HEADING_BOUNDARY.split(text)
    chunks: list[str] = []
    current = ""
    for part in parts:
        if current and len(current) + len(part) > limit:
            chunks.append(current)
            current = part
        else:
            current += part
    if current:
        chunks.append(current)
    return chunks


def process_notes_model(text: str, classifier,
                        limit: int = CHUNK_CHAR_LIMIT) -> tuple[str, dict]:
    """Model-backed notes processing: chunk → classify → trim → clean.

    Returns ``(markdown, info)`` where ``info`` records the model's work
    (chunk count / dropped count) for the document metadata. ``classifier``
    is a :class:`..stages.classify.SectionClassifier` (or anything with its
    ``predict(texts)`` API)."""
    chunks = chunk_notes(text, limit)
    # classify on each chunk's HEAD only: the section-type signal is in the
    # leading heading/sentences, and hashing a full 100k-char chunk costs
    # ~2 ms/doc of pure feature extraction (measured as an ~18% per-doc
    # regression when this path first shipped unbounded)
    labels, confs = classifier.predict([c[:4000] for c in chunks])
    # trim trailing bleed-through only — never drop interior content, and
    # never drop the sole chunk (a notes section IS notes by construction)
    dropped = 0
    while (len(chunks) - dropped > 1
           and labels[len(chunks) - dropped - 1] in _FOREIGN_LABELS
           and confs[len(chunks) - dropped - 1] >= _DROP_CONF):
        dropped += 1
    kept = chunks[:len(chunks) - dropped]
    cleaned = [clean_prose(c) for c in kept]
    info = {"notes_chunks": len(chunks), "notes_dropped": dropped}
    return "\n\n".join(c for c in cleaned if c), info
