"""Text tokenization for the T5 encoders.

Loads the HF T5 tokenizer from a local checkpoint dir (the LanDiff ckpt tree
ships t5-v1_1-xxl; stage 1 uses google/flan-t5-xxl from the HF cache —
text_encoder.py:137-146, encoders/modules.py:246-295). In fully-offline
environments without tokenizer files a deterministic byte-level fallback is
used so smoke tests and benchmarks can run; it is clearly marked and never
silently used when a real tokenizer is available.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("landiff_tpu.text")


class T5Text:
    """tokenize_padded equivalent: left padding for stage-1
    (text_encoder.py:39 padding_side='left'), max-length padding for
    stage-2 (encoders/modules.py:282 padding='max_length')."""

    def __init__(self, model_dir: str | None = None, max_length: int = 512,
                 padding_side: str = "left", vocab_size: int = 32128,
                 require_real: bool = False):
        """require_real: set when REAL (checkpoint-converted) model params
        are in play — a missing tokenizer then raises instead of silently
        degrading to the byte-hash fallback (which would feed the real T5
        garbage ids and poison every downstream code)."""
        self.max_length = max_length
        self.padding_side = padding_side
        self.vocab_size = vocab_size
        self.tokenizer = None
        err = None
        if model_dir is not None:
            try:
                from transformers import T5Tokenizer, AutoTokenizer

                if Path(model_dir).exists() or "/" in model_dir:
                    self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
                else:
                    err = FileNotFoundError(model_dir)
            except Exception as e:
                err = e
        elif require_real:
            err = ValueError("no tokenizer model_dir given")
        if self.tokenizer is None and err is not None:
            if require_real:
                raise RuntimeError(
                    f"real model weights require a real T5 tokenizer, but "
                    f"loading from {model_dir!r} failed: {err}") from err
            logger.warning("T5 tokenizer unavailable (%s); using "
                           "byte-level fallback tokenizer", err)

    def __call__(self, texts: list[str], pad_to_max: bool = False):
        """Returns (input_ids (B, L) int32, attn_mask (B, L) bool)."""
        if self.tokenizer is not None:
            enc = self.tokenizer(
                texts, max_length=self.max_length, truncation=True,
                padding="max_length" if pad_to_max else "longest",
                return_attention_mask=True)
            ids = np.asarray(enc["input_ids"], np.int32)
            mask = np.asarray(enc["attention_mask"], bool)
            if self.padding_side == "left" and not pad_to_max:
                # HF T5Tokenizer honors padding_side at load; AutoTokenizer
                # default is right — normalize by rolling pads to the left
                ids, mask = _left_align_pad(ids, mask)
            return ids, mask
        return self._fallback(texts, pad_to_max)

    def _fallback(self, texts, pad_to_max):
        """Deterministic byte-hash tokenizer (offline smoke only)."""
        seqs = []
        for t in texts:
            b = t.encode()[: self.max_length - 1]
            ids = [(c * 2654435761) % (self.vocab_size - 2) + 2 for c in b]
            ids.append(1)  # eos
            seqs.append(ids)
        L = self.max_length if pad_to_max else max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), bool)
        for i, s in enumerate(seqs):
            if self.padding_side == "left" and not pad_to_max:
                ids[i, L - len(s):] = s
                mask[i, L - len(s):] = True
            else:
                ids[i, :len(s)] = s
                mask[i, :len(s)] = True
        return ids, mask


def _left_align_pad(ids, mask):
    out_ids = np.zeros_like(ids)
    out_mask = np.zeros_like(mask)
    L = ids.shape[1]
    for i in range(ids.shape[0]):
        n = int(mask[i].sum())
        out_ids[i, L - n:] = ids[i, :n]
        out_mask[i, L - n:] = True
    return out_ids, out_mask
