"""Tokenizer front-end.

Production path: the HuggingFace umT5 tokenizer from the checkpoint directory
(the reference loads ``google/umt5-xxl`` — `config/wan2.1/wan_civitai.yaml:16`).
For weight-free environments (tests, CI) a deterministic hashing fallback
keeps the pipeline runnable end to end; it is clearly NOT the production
vocabulary.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


class _FallbackTokenizer:
    """Deterministic word-hash tokenizer: pad=0, eos=1, words hash into
    [2, vocab). Only for running without the umT5 sentencepiece files."""

    def __init__(self, vocab_size: int = 256384):
        self.vocab_size = vocab_size

    def __call__(self, texts: Sequence[str], max_length: int):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, text in enumerate(texts):
            toks = []
            for w in text.lower().split():
                h = int.from_bytes(
                    hashlib.blake2s(w.encode(), digest_size=4).digest(), "big")
                toks.append(2 + h % (self.vocab_size - 2))
            toks = toks[: max_length - 1] + [1]  # eos
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


class WanTokenizer:
    """``require_real=True`` (the CLI/serving default when a checkpoint path
    is given) turns a tokenizer-load failure into a hard error instead of the
    silent hash fallback — a typo'd checkpoint path must not hash-tokenize
    production prompts into garbage embeddings."""

    def __init__(self, path_or_name: Optional[str] = None,
                 vocab_size: int = 256384, require_real: bool = False):
        self._hf = None
        self.is_fallback = True
        if path_or_name is not None:
            try:
                from transformers import AutoTokenizer
                self._hf = AutoTokenizer.from_pretrained(path_or_name)
                self.is_fallback = False
            except Exception as e:
                if require_real:
                    raise RuntimeError(
                        f"could not load the umT5 tokenizer from "
                        f"{path_or_name!r} ({e}); refusing the hash-fallback "
                        f"tokenizer (require_real=True)") from e
                import sys
                print(f"[tokenizer] WARNING: failed to load tokenizer from "
                      f"{path_or_name!r} ({e}); using the deterministic "
                      f"HASH fallback — embeddings will NOT match the "
                      f"production vocabulary", file=sys.stderr)
                self._hf = None
        if self._hf is None:
            self._fallback = _FallbackTokenizer(vocab_size)

    def __call__(self, texts: Union[str, Sequence[str]],
                 max_length: int = 512) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        if self._hf is not None:
            enc = self._hf(list(texts), padding="max_length",
                           max_length=max_length, truncation=True,
                           add_special_tokens=True, return_tensors="np")
            return (enc["input_ids"].astype(np.int32),
                    enc["attention_mask"].astype(np.int32))
        return self._fallback(texts, max_length)
