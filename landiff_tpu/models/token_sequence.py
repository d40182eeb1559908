"""General interleaved token/feature sequence builder.

Reference: llm/modules/tokens.py:7-171 (Vocab, TokenSequence). The
stage-1 prompt assembly in models/lm.py uses precomputed schedule arrays
for the jitted sampler; this is the general host-side builder the
reference exposes for training-data construction — tokens, injected
feature spans, loss masks, named ranges, and batch collation.

Host-side (numpy): sequences are built eagerly and handed to jit as
arrays; features may be jax arrays (concatenated with jnp when present).
"""

from __future__ import annotations

import numpy as np

IGNORE_INDEX = -100   # matches F.cross_entropy default (tokens.py:32-33)


class Vocab:
    """Composable vocab: named contiguous id ranges + named special ids
    allocated in call order (tokens.py:7-26). Specials are attributes:
    ``v.EOS``."""

    def __init__(self):
        self._range: dict[str, tuple[int, int]] = {}
        self._specials: dict[str, int] = {}
        self._size = 0

    def size(self) -> int:
        return self._size

    def add_special(self, name: str):
        self._specials[name] = self._size
        self._size += 1

    def add_range(self, name: str, size: int):
        assert isinstance(size, int) and size > 0, size
        self._range[name] = (self._size, self._size + size)
        self._size += size

    def range(self, name: str) -> tuple[int, int]:
        return self._range[name]

    def __getattr__(self, name):
        try:
            return self.__dict__["_specials"][name]
        except KeyError:
            raise AttributeError(name) from None


class TokenSequence:
    """Interleaves raw tokens (id IGNORE_INDEX where feature-only),
    feature spans, and per-position loss masks; tracks named ranges;
    `collate` builds [N, L] tokens + [N, L, D] features + loss mask
    (tokens.py:29-171)."""

    IGNORE_INDEX = IGNORE_INDEX

    def __init__(self):
        self._tokens: list[np.ndarray] = []
        self._features: list = []          # None or (len, D) array
        self._loss_mask: list[np.ndarray] = []
        self._ranges: dict[str, tuple[int, int]] = {}
        self._length = 0

    def __len__(self) -> int:
        return self._length

    def _note_range(self, name, start):
        if name:
            assert name not in self._ranges, name
            self._ranges[name] = (start, len(self))

    @property
    def ranges(self) -> dict[str, tuple[int, int]]:
        return dict(self._ranges)

    def append_token(self, tokens, loss_mask, *, name: str | None = None):
        start = len(self)
        tokens = np.asarray(tokens)
        assert tokens.ndim == 1, tokens.shape
        assert np.issubdtype(tokens.dtype, np.integer), tokens.dtype
        if isinstance(loss_mask, (bool, np.bool_)):
            loss_mask = np.full((len(tokens),), bool(loss_mask))
        else:
            loss_mask = np.asarray(loss_mask)
            assert loss_mask.dtype == np.bool_, loss_mask.dtype
            assert len(loss_mask) == len(tokens), (len(loss_mask),
                                                   len(tokens))
        self._tokens.append(tokens.astype(np.int64))
        self._loss_mask.append(loss_mask)
        self._features.append(None)
        self._length += len(tokens)
        self._note_range(name, start)

    def append_feature(self, feature, *, name: str | None = None):
        start = len(self)
        assert feature.ndim == 2, feature.shape
        n = feature.shape[0]
        self._features.append(feature)
        self._loss_mask.append(np.zeros((n,), bool))
        self._tokens.append(np.full((n,), self.IGNORE_INDEX, np.int64))
        self._length += n
        self._note_range(name, start)

    def append_token_and_feature(self, token, feature, loss_mask, *,
                                 name: str | None = None):
        self.append_token(token, loss_mask, name=name)
        if feature is not None:
            assert len(feature) == len(self._tokens[-1])
            assert feature.ndim == 2, feature.shape
            self._features[-1] = feature

    def get_tokens(self) -> np.ndarray:
        return np.concatenate(self._tokens, axis=0)

    def get_loss_mask(self) -> np.ndarray:
        return np.concatenate(self._loss_mask, axis=0)

    def get_features(self, embedding=None):
        """Concatenated (L, D) features; token-only spans are looked up in
        `embedding` (a (V, D) table — tokens.py:144-154)."""
        import jax.numpy as jnp

        feats = []
        for tokens, f in zip(self._tokens, self._features):
            if f is None:
                assert embedding is not None, \
                    "embedding required for token-only spans"
                f = jnp.asarray(embedding)[jnp.asarray(tokens)]
            feats.append(jnp.asarray(f))
        return jnp.concatenate(feats, axis=0)

    @staticmethod
    def collate(sequences: list["TokenSequence"], embedding=None):
        """Stack equal-length sequences into [N, L] tokens, [N, L, D]
        features, [N, L] loss mask (tokens.py:156-171; unlike the
        reference's get_features(None), an embedding table may be passed
        so token-only spans don't have to carry explicit features)."""
        import jax.numpy as jnp

        lengths = {len(s) for s in sequences}
        assert len(lengths) == 1, lengths
        tokens = np.stack([s.get_tokens() for s in sequences])
        features = jnp.stack([s.get_features(embedding)
                              for s in sequences])
        loss_mask = np.stack([s.get_loss_mask() for s in sequences])
        return tokens, features, loss_mask
